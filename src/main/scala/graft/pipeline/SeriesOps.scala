package graft.pipeline

import graft.model.GapFillMode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed series operators over long rows (scope, metric, bucket,
  * value). All operators are declarative DataFrame plans: Catalyst gets
  * pushdown/pruning, hash aggregates run partial+final, and every
  * per-series window uses ClusteredDistribution(scope, metric) — which a
  * single upstream repartition(scope) already satisfies, so chained series
  * ops introduce NO additional shuffles.
  */
object SeriesOps {

  private def seriesWindow = Window.partitionBy("scope", "metric").orderBy("bucket")

  /** O2+O3 (`AbstractDataLoader.java:137,144-151`): re-bucket timestamps and
    * merge duplicates by SUM. Also the tier rollup (`Timeseries.java:54-61`)
    * — the same aggregation at a coarser resolution.
    */
  def bucketSum(points: DataFrame, resolution: Long): DataFrame =
    points
      .withColumn("bucket", col("bucket") - col("bucket") % resolution)
      .groupBy("scope", "metric", "bucket")
      .agg(sum("value").as("value"))

  /** O5 (`AbstractDataLoader.java:154-174`): interior gap fill. Zero mode is
    * reference parity; Locf / Linear are the north_star extensions. Quirk
    * preserved: a point at bucket 0 never opens a gap (tsPrev != 0 guard).
    *
    * Single-pass plan: lead() over the series window, then each row explodes
    * into itself + its trailing fill points — no union, so the upstream is
    * scanned exactly once (the union formulation re-executed the whole input
    * subtree a second time for the filler branch).
    */
  def gapFill(series: DataFrame, resolution: Long, mode: GapFillMode.Value = GapFillMode.Zero): DataFrame = {
    val hasGap =
      col("_next_bucket").isNotNull && col("bucket") =!= 0L &&
        (col("_next_bucket") - col("bucket")) =!= resolution
    val fillBuckets =
      when(hasGap, sequence(col("bucket") + resolution, col("_next_bucket") - resolution, lit(resolution)))
        .otherwise(array().cast("array<bigint>"))
    def fillValue(b: org.apache.spark.sql.Column) = mode match {
      case GapFillMode.Zero => lit(0.0)
      case GapFillMode.Locf => col("value")
      case GapFillMode.Linear =>
        col("value") + (col("_next_value") - col("value")) *
          ((b - col("bucket")).cast("double") / (col("_next_bucket") - col("bucket")).cast("double"))
    }
    series
      .withColumn("_next_bucket", lead("bucket", 1).over(seriesWindow))
      .withColumn("_next_value", lead("value", 1).over(seriesWindow))
      .select(
        col("scope"),
        col("metric"),
        explode(
          concat(
            array(struct(col("bucket").as("b"), col("value").as("v"))),
            transform(fillBuckets, b => struct(b.as("b"), fillValue(b).as("v")))
          )
        ).as("_p")
      )
      .select(col("scope"), col("metric"), col("_p.b").as("bucket"), col("_p.v").as("value"))
  }

  /** O9+O10 (`Timeseries.java:75-79,125-149`): annotate each point with its
    * train/classify membership and per-series pre-sanitize stats. trainN =
    * floor(0.7·n), bumped to n − forecastPeriods when the classify tail would
    * exceed forecastPeriods. (These are PRE-sanitize stats; chain
    * `withSanitizedTrain` after this for the exact O11 sanitize and the
    * post-sanitize stats at scale.)
    */
  def withSplitAndStats(series: DataFrame, forecastPeriods: Long): DataFrame = {
    val w = seriesWindow
    val wAll = Window.partitionBy("scope", "metric")
    // stats as conditional WINDOW aggregates over the same partitioning —
    // one pass, no join, and (unlike a groupBy + join-back) the upstream
    // plan is not duplicated into a second subtree.
    val trainVal = when(col("is_train"), col("value"))
    series
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn(
        "_train_n",
        when(col("_n") - floor(col("_n") * 0.7) > forecastPeriods, col("_n") - forecastPeriods)
          .otherwise(floor(col("_n") * 0.7))
      )
      .withColumn("is_train", col("_rn") <= col("_train_n"))
      .withColumn("train_avg", avg(trainVal).over(wAll))
      .withColumn("train_stddev", stddev_pop(trainVal).over(wAll))
      .withColumn("train_min", min(trainVal).over(wAll))
      .withColumn("train_max", max(trainVal).over(wAll))
      .withColumn("train_count", count(trainVal).over(wAll))
      .drop("_rn", "_train_n")
  }

  /** O11 at scale — EXACT distributed train sanitize
    * (`Timeseries.java:151-185`; kernel `SeriesKernel.sanitize`): train
    * points outside avg ± `sigma`·σ are replaced by (avg + previousKept)/2,
    * where previousKept is the last IN-BOUNDS ORIGINAL train value (seeded
    * with avg). The recurrence looks sequential, but `previousKept` never
    * depends on REPLACED values — only on original in-bounds ones — so it
    * collapses to a window expression: last(in-bounds value, ignoreNulls)
    * over unbounded-preceding..1-preceding. One window pass over the
    * existing (scope, metric) partitioning, no recursion, no driver loop —
    * this closes the round-2 "scale-path approximation" divergence note.
    *
    * Input: `withSplitAndStats` output. Adds `value_san` (== value for
    * classify rows and in-bounds train rows), `was_replaced`, and
    * post-sanitize train stats `san_avg`/`san_stddev` (population σ,
    * recomputed over sanitized train values exactly like the kernel).
    */
  def withSanitizedTrain(withStats: DataFrame, sigma: Double = 6.0): DataFrame = {
    val wPrev = seriesWindow.rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy("scope", "metric")
    val lb = col("train_avg") - col("train_stddev") * sigma
    val rb = col("train_avg") + col("train_stddev") * sigma
    val inBounds = col("value") >= lb && col("value") <= rb
    val sanVal = when(col("is_train"), col("_san")).otherwise(col("value"))
    withStats
      .withColumn("_kept", when(col("is_train") && inBounds, col("value")))
      .withColumn(
        "_san",
        when(inBounds, col("value"))
          .otherwise((col("train_avg") + coalesce(last(col("_kept"), ignoreNulls = true).over(wPrev), col("train_avg"))) / 2.0)
      )
      .withColumn("value_san", sanVal)
      .withColumn("was_replaced", col("is_train") && !inBounds)
      .withColumn("san_avg", avg(when(col("is_train"), col("value_san"))).over(wAll))
      .withColumn("san_stddev", stddev_pop(when(col("is_train"), col("value_san"))).over(wAll))
      .drop("_kept", "_san")
  }

  /** O7 (`AbstractDataLoader.java:233-261`): derive error_rate per scope from
    * the aligned regular/error series — the reference's only join, expressed
    * as a conditional aggregation (pivot by metric) instead of a self-join:
    * one hash aggregate, no join at all. Gate: both train avgs ≥ 10.
    */
  def deriveErrorRate(series: DataFrame, forecastPeriods: Long): DataFrame = {
    // pivot to wide rows (regular & error share the bucket set by
    // construction), then train split + gate averages as WINDOW aggregates
    // over scope — single aggregation, no join, upstream scanned once.
    val wide = series
      .where(col("metric").isin("regular", "error"))
      .groupBy("scope", "bucket")
      .agg(
        max(when(col("metric") === "regular", col("value"))).as("regular"),
        max(when(col("metric") === "error", col("value"))).as("error")
      )
      .where(col("regular").isNotNull && col("error").isNotNull)
    val w = Window.partitionBy("scope").orderBy("bucket")
    val wAll = Window.partitionBy("scope")
    wide
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn(
        "_train_n",
        when(col("_n") - floor(col("_n") * 0.7) > forecastPeriods, col("_n") - forecastPeriods)
          .otherwise(floor(col("_n") * 0.7))
      )
      .withColumn("_is_train", col("_rn") <= col("_train_n"))
      .withColumn("_avg_regular", avg(when(col("_is_train"), col("regular"))).over(wAll))
      .withColumn("_avg_error", avg(when(col("_is_train"), col("error"))).over(wAll))
      .where(col("_avg_regular") >= 10.0 && col("_avg_error") >= 10.0)
      .select(
        col("scope"),
        lit("error_rate").as("metric"),
        col("bucket"),
        when(col("regular") > 0 && col("error") > 0, col("error") / col("regular"))
          .when(col("error") > 0, lit(1.0))
          .otherwise(lit(0.0))
          .as("value")
      )
  }

  /** O8 (`AbstractDataLoader.java:203-224`): auto log-normalize any series
    * whose train max−min ≥ 1000 (log of every point; v < 1/Double.MAX_VALUE →
    * 0). Uses the stats columns from withSplitAndStats.
    */
  def autoNormalize(withStats: DataFrame): DataFrame =
    withStats.withColumn(
      "value",
      when(
        col("train_max") - col("train_min") >= 1000.0,
        when(col("value") < lit(1 / Double.MaxValue), 0.0).otherwise(log(col("value")))
      ).otherwise(col("value"))
    )

  /** O4 (`AbstractDataLoader.java:414-442` ValueNormalizationModes): value
    * pre-normalization applied at parse time, as a pure column expression —
    * the DataFrame analog of `SeriesKernel.normalizeValue`. Log modes clamp
    * sub-1/Double.MaxValue inputs (incl. 0 and negatives) to 0, matching
    * the reference's guard.
    */
  def normalize(points: DataFrame, mode: graft.model.NormalizationMode.Value): DataFrame = {
    import graft.model.NormalizationMode._
    val tiny = 1 / Double.MaxValue
    def clamped(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      when(col("value") < tiny, 0.0).otherwise(f(col("value")))
    val v = mode match {
      case Log        => clamped(log(_))
      case Log10      => clamped(log10(_))
      case LogNatural => clamped(log1p(_))
      case Sqrt       => sqrt(col("value"))
      case _          => col("value")
    }
    points.withColumn("value", v)
  }

  /** O6 generalized (north_rule): the continuous-aggregate tier ladder.
    * Returns (resolution → DataFrame) for raw→1m→1h→1d, each tier built by
    * re-aggregating the previous (narrower input each step).
    */
  def tiers(points: DataFrame): Seq[(String, Long, DataFrame)] = {
    val m1 = bucketSum(points, 60L)
    val h1 = bucketSum(m1, 3600L)
    val d1 = bucketSum(h1, 86400L)
    Seq(("1m", 60L, m1), ("1h", 3600L, h1), ("1d", 86400L, d1))
  }

  /** O12: per-series deltas (value − lag(value)) over the series window. */
  def deltas(series: DataFrame): DataFrame =
    series
      .withColumn("_prev", lag("value", 1).over(seriesWindow))
      .where(col("_prev").isNotNull)
      .select(col("scope"), col("metric"), col("bucket"), (col("value") - col("_prev")).as("value"))
}
