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
    * Implementation: lead() over the series window → explode(sequence) for
    * the missing buckets → union. No shuffle beyond the series window's.
    */
  def gapFill(series: DataFrame, resolution: Long, mode: GapFillMode.Value = GapFillMode.Zero): DataFrame = {
    val withNext = series
      .withColumn("_next_bucket", lead("bucket", 1).over(seriesWindow))
      .withColumn("_next_value", lead("value", 1).over(seriesWindow))
    val fillers = withNext
      .where(
        col("_next_bucket").isNotNull &&
          col("bucket") =!= 0L &&
          (col("_next_bucket") - col("bucket")) =!= resolution
      )
      .select(
        col("scope"),
        col("metric"),
        explode(sequence(col("bucket") + resolution, col("_next_bucket") - resolution, lit(resolution)))
          .as("fill_bucket"),
        col("bucket"),
        col("value"),
        col("_next_bucket"),
        col("_next_value")
      )
      .select(
        col("scope"),
        col("metric"),
        col("fill_bucket").as("bucket"),
        (mode match {
          case GapFillMode.Zero => lit(0.0)
          case GapFillMode.Locf => col("value")
          case GapFillMode.Linear =>
            col("value") + (col("_next_value") - col("value")) *
              ((col("fill_bucket") - col("bucket")).cast("double") /
                (col("_next_bucket") - col("bucket")).cast("double"))
        }).as("value")
      )
    series.unionByName(fillers)
  }

  /** O9+O10 (`Timeseries.java:75-79,125-149`): annotate each point with its
    * train/classify membership and per-series pre-sanitize stats. trainN =
    * floor(0.7·n), bumped to n − forecastPeriods when the classify tail would
    * exceed forecastPeriods. (The sanitize step O11 is sequential and lives in
    * the kernel path; this is the scale-path approximation used by the
    * column-math analyzers, exact whenever no train point exceeds 6σ.)
    */
  def withSplitAndStats(series: DataFrame, forecastPeriods: Long): DataFrame = {
    val w = seriesWindow
    val wAll = Window.partitionBy("scope", "metric")
    val annotated = series
      .withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn(
        "_train_n",
        when(col("_n") - floor(col("_n") * 0.7) > forecastPeriods, col("_n") - forecastPeriods)
          .otherwise(floor(col("_n") * 0.7))
      )
      .withColumn("is_train", col("_rn") <= col("_train_n"))
    val stats = annotated
      .where(col("is_train"))
      .groupBy("scope", "metric")
      .agg(
        avg("value").as("train_avg"),
        stddev_pop("value").as("train_stddev"),
        min("value").as("train_min"),
        max("value").as("train_max"),
        count(lit(1)).as("train_count")
      )
    // per-series scalars: broadcast join back onto the points
    annotated.join(broadcast(stats), Seq("scope", "metric"), "left").drop("_rn", "_train_n")
  }

  /** O7 (`AbstractDataLoader.java:233-261`): derive error_rate per scope from
    * the aligned regular/error series — the reference's only join, expressed
    * as a conditional aggregation (pivot by metric) instead of a self-join:
    * one hash aggregate, no join at all. Gate: both train avgs ≥ 10.
    */
  def deriveErrorRate(series: DataFrame, forecastPeriods: Long): DataFrame = {
    val wide = series
      .where(col("metric").isin("regular", "error"))
      .groupBy("scope", "bucket")
      .agg(
        max(when(col("metric") === "regular", col("value"))).as("regular"),
        max(when(col("metric") === "error", col("value"))).as("error")
      )
      .where(col("regular").isNotNull && col("error").isNotNull)
    // gate on train averages of both series
    val split = withSplitAndStats(series.where(col("metric").isin("regular", "error")), forecastPeriods)
    val gates = split
      .groupBy("scope")
      .agg(
        min(when(col("metric") === "regular", col("train_avg"))).as("avg_regular"),
        min(when(col("metric") === "error", col("train_avg"))).as("avg_error")
      )
      .where(col("avg_regular") >= 10.0 && col("avg_error") >= 10.0)
      .select("scope")
    wide
      .join(broadcast(gates), Seq("scope"), "left_semi")
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
