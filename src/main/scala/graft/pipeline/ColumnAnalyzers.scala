package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-path outlier scorers as pure windowed/aggregate column expressions
  * (north_star: "simple moving average deviation, stddev z-score,
  * interquartile-range, and LS-regression forecast-error validators as
  * windowed aggregate expressions"). These run fully codegen'd at any scale —
  * no per-scope state — and are SQL-expressible, so each has a DuckDB oracle
  * in SparkEntry. The bit-exact reference semantics live in graft.kernel /
  * graft.spark.Detect; these are their distributed analogs with identical
  * gates/bounds but distributed (order-insensitive) aggregation.
  *
  * Input: output of SeriesOps.withSplitAndStats — long rows plus is_train,
  * train_avg/train_stddev/train_min/train_max columns.
  */
object ColumnAnalyzers {

  /** A2 analog (`NormalDistributionTimeserieAnalyzer.java:10-49`): z-score
    * band avg ± max(1σ, 0.05·avg) over classify points; series gate
    * σ ≤ 0.25·avg.
    */
  def zscoreFlags(withStats: DataFrame): DataFrame = {
    val maxErr = greatest(col("train_stddev"), col("train_avg") * 0.05)
    withStats
      .where(!col("is_train") && col("train_stddev") <= col("train_avg") * 0.25)
      .select(
        col("scope"),
        col("metric"),
        col("bucket"),
        col("value"),
        col("train_avg").as("expected"),
        (col("train_avg") - maxErr).as("lb"),
        (col("train_avg") + maxErr).as("rb"),
        (col("value") < col("train_avg") - maxErr || col("value") > col("train_avg") + maxErr)
          .as("is_outlier")
      )
  }

  /** A4 analog (`SimpleRegressionTimeserieAnalyzer.java:12-70`): per-series
    * OLS on (bucket, value) train points via covar_pop/var_pop aggregates;
    * gate relMse = 1 − corr² ≤ 0.05; bounds ŷ·(1 ∓ max(0.5·relMse, 0.02)).
    */
  def olsForecastFlags(withStats: DataFrame): DataFrame = {
    val fit = withStats
      .where(col("is_train"))
      .groupBy("scope", "metric")
      .agg(
        (covar_pop(col("bucket").cast("double"), col("value")) /
          var_pop(col("bucket").cast("double"))).as("slope"),
        avg("value").as("ybar"),
        avg(col("bucket").cast("double")).as("xbar"),
        corr(col("bucket").cast("double"), col("value")).as("r")
      )
      .withColumn("intercept", col("ybar") - col("slope") * col("xbar"))
      .withColumn("rel_mse", coalesce(lit(1.0) - col("r") * col("r"), lit(0.0)))
      .where(col("rel_mse") <= 0.05)
      .select("scope", "metric", "slope", "intercept", "rel_mse")
    val joined = withStats.where(!col("is_train")).join(broadcast(fit), Seq("scope", "metric"))
    val expected = col("intercept") + col("slope") * col("bucket").cast("double")
    val maxRelDif = greatest(col("rel_mse") * 0.5, lit(0.02))
    joined.select(
      col("scope"),
      col("metric"),
      col("bucket"),
      col("value"),
      expected.as("expected"),
      (expected * (lit(1.0) - maxRelDif)).as("lb"),
      (expected * (lit(1.0) + maxRelDif)).as("rb"),
      (col("value") < expected * (lit(1.0) - maxRelDif) ||
        col("value") > expected * (lit(1.0) + maxRelDif)).as("is_outlier")
    )
  }

  /** A5 analog: moving-average deviation — MA over the previous `window`
    * points (rowsBetween, codegen'd); flag when |value − ma| exceeds
    * max(1σ, 0.05·avg). Runs over ALL points with a full preceding window.
    */
  def movingAverageFlags(withStats: DataFrame, window: Int = 10): DataFrame = {
    val w = Window.partitionBy("scope", "metric").orderBy("bucket").rowsBetween(-window, -1)
    val cnt = count(lit(1)).over(w)
    val ma = avg("value").over(w)
    val maxErr = greatest(col("train_stddev"), col("train_avg") * 0.05)
    withStats
      .withColumn("expected", ma)
      .withColumn("_cnt", cnt)
      .where(col("_cnt") === window && !col("is_train"))
      .select(
        col("scope"),
        col("metric"),
        col("bucket"),
        col("value"),
        col("expected"),
        (col("expected") - maxErr).as("lb"),
        (col("expected") + maxErr).as("rb"),
        (col("value") < col("expected") - maxErr || col("value") > col("expected") + maxErr)
          .as("is_outlier")
      )
  }

  /** IQR validator (north_star addition; no reference analog): per-series
    * train quartiles via exact percentile (linear interpolation — matches
    * DuckDB quantile_cont); fences q1 − k·iqr, q3 + k·iqr.
    */
  def iqrFlags(withStats: DataFrame, k: Double = 1.5): DataFrame = {
    val fences = withStats
      .where(col("is_train"))
      .groupBy("scope", "metric")
      .agg(
        percentile(col("value"), lit(0.25)).as("q1"),
        percentile(col("value"), lit(0.75)).as("q3")
      )
      .withColumn("lb", col("q1") - (col("q3") - col("q1")) * k)
      .withColumn("rb", col("q3") + (col("q3") - col("q1")) * k)
      .select("scope", "metric", "lb", "rb")
    withStats
      .where(!col("is_train"))
      .join(broadcast(fences), Seq("scope", "metric"))
      .select(
        col("scope"),
        col("metric"),
        col("bucket"),
        col("value"),
        ((col("lb") + col("rb")) / 2).as("expected"),
        col("lb"),
        col("rb"),
        (col("value") < col("lb") || col("value") > col("rb")).as("is_outlier")
      )
  }

  /** V2+V3 analog at scale: net score per (scope, bucket) across flag frames
    * — outliers add 3 + magnitude (ln-ratio clamped to [0,3],
    * `TimeserieOutlier.java:56-73`), inliers subtract 1.
    */
  def score(flagFrames: Seq[DataFrame], minScore: Double = 1.0): DataFrame = {
    val all = flagFrames.reduce(_.unionByName(_))
    val crossed = when(col("value") < col("lb"), abs((col("lb") - col("value")) / col("lb")))
      .otherwise(abs((col("rb") - col("value")) / col("rb")))
    val mag = least(greatest(coalesce(log(crossed), lit(0.0)), lit(0.0)), lit(3.0))
    all
      .withColumn("_contrib", when(col("is_outlier"), lit(3.0) + mag).otherwise(lit(-1.0)))
      .groupBy("scope", "bucket")
      .agg(sum("_contrib").as("score"))
      .where(col("score") >= minScore)
  }
}
