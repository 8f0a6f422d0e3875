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

  /** Alert-policy suppression (`Timeseries.java:27-37`,
    * `AbstractDataLoader.java:185-187`): error-family series alert on OVER
    * only — an under-bound outlier on them is dropped entirely (reference
    * `continue`s: not demoted to inlier). The reference never disables
    * alertOutlierOver, so only the under case needs a filter. Applied inside
    * every flags function so the scale path matches kernel behavior on
    * error/error_rate series.
    */
  private val errorFamily = Seq("error", "error_rate")

  /** ANSI-safe division: null (not an exception) on a zero divisor — needed
    * because Spark 4 runs ANSI mode by default and crafted series can have
    * zero variance (constant deltas / constant profiles). CASE branches are
    * evaluated lazily in codegen, so the division never executes on zero.
    */
  private def safeDiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    when(b =!= 0.0, a / b)

  /** Pearson correlation as covar_pop/(σ_x·σ_y) with a null (not NaN/throw)
    * result on zero variance — matches DuckDB corr's NULL there, and the
    * population/sample scale factors cancel vs built-in corr.
    */
  private def corrSafe(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
    safeDiv(covar_pop(x, y), stddev_pop(x) * stddev_pop(y))
  private def notSuppressed =
    !(col("is_outlier") && col("value") < col("lb") && col("metric").isin(errorFamily: _*))

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
      .where(notSuppressed)
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
    ).where(notSuppressed)
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
      .where(notSuppressed)
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
      .where(notSuppressed)
  }

  /** A3 analog (`LogNormalDistributionTimeserieAnalyzer.java:10-68`):
    * z-score band over CONVERTED values lv = ln(v) with the reference's
    * infinite→1/Double.MAX_VALUE clamp (v=0 → tiny; negatives — which the
    * reference maps to NaN — are clamped to tiny as well: Spark's log()
    * nulls them, and no series in the domain carries negatives). Per-series
    * avg/σ_pop computed over converted TRAIN values; gates σ ≤ 0.05·avg and
    * σ ≥ 1/Double.MAX_VALUE. Quirk preserved: OUTLIER rows carry the
    * converted value, INLIER rows the raw one (`:57` vs `:63`).
    */
  def logNormalFlags(withStats: DataFrame): DataFrame = {
    val tiny = 1 / Double.MaxValue
    val lv = when(col("value") > 0.0, log(col("value"))).otherwise(lit(tiny))
    val wAll = Window.partitionBy("scope", "metric")
    val trainLv = when(col("is_train"), lv)
    val maxErr = greatest(col("_lsd"), col("_lavg") * 0.05)
    withStats
      .withColumn("_lv", lv)
      .withColumn("_lavg", avg(trainLv).over(wAll))
      .withColumn("_lsd", stddev_pop(trainLv).over(wAll))
      .where(!col("is_train") && col("_lsd") <= col("_lavg") * 0.05 && col("_lsd") >= tiny)
      .withColumn("is_outlier", col("_lv") < col("_lavg") - maxErr || col("_lv") > col("_lavg") + maxErr)
      .select(
        col("scope"),
        col("metric"),
        col("bucket"),
        when(col("is_outlier"), col("_lv")).otherwise(col("value")).as("value"),
        col("_lavg").as("expected"),
        (col("_lavg") - maxErr).as("lb"),
        (col("_lavg") + maxErr).as("rb"),
        col("is_outlier")
      )
      .where(notSuppressed)
  }

  /** A9 analog (`RandomWalkRegressionTimeserieAnalyzer.java:12-68`): OLS on
    * TRAIN deltas (d_i = v_i − v_{i−1}, keyed by the later bucket), gate
    * relMse = 1 − corr² ≤ 0.05 (NaN → 0), then a running-sum forecast over
    * classify points: expected_k = lastTrainValue + Σ_{j≤k}(a + b·bucket_j),
    * bounds expected·(1 ∓ max(0.5·relMse, 0.02)).
    */
  def randomWalkFlags(withStats: DataFrame): DataFrame = {
    val fit = randomWalkFit(withStats)
      .where(col("reliable"))
      .select("scope", "metric", "slope", "intercept", "rel_mse", "last_train")
    val classify = withStats.where(!col("is_train")).join(broadcast(fit), Seq("scope", "metric"))
    val wc = Window
      .partitionBy("scope", "metric")
      .orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = col("last_train") +
      sum(col("intercept") + col("slope") * col("bucket").cast("double")).over(wc)
    val maxRelDif = greatest(col("rel_mse") * 0.5, lit(0.02))
    classify
      .withColumn("expected", expected)
      .select(
        col("scope"),
        col("metric"),
        col("bucket"),
        col("value"),
        col("expected"),
        (col("expected") * (lit(1.0) - maxRelDif)).as("lb"),
        (col("expected") * (lit(1.0) + maxRelDif)).as("rb"),
        (col("value") < col("expected") * (lit(1.0) - maxRelDif) ||
          col("value") > col("expected") * (lit(1.0) + maxRelDif)).as("is_outlier")
      )
      .where(notSuppressed)
  }

  /** A9's per-series fit table (exposed: the driver oracle checks the fit
    * itself, since the relMse ≤ 0.05 gate usually rejects noisy real series
    * and an all-gated flags result would be a vacuous oracle).
    */
  def randomWalkFit(withStats: DataFrame): DataFrame = {
    val w = Window.partitionBy("scope", "metric").orderBy("bucket")
    val withDelta = withStats
      .withColumn("_prev_v", lag("value", 1).over(w))
      .withColumn("_prev_train", lag("is_train", 1).over(w))
    val trainDelta = col("is_train") && col("_prev_train")
    val db = when(trainDelta, col("bucket").cast("double"))
    val dv = when(trainDelta, col("value") - col("_prev_v"))
    withDelta
      .groupBy("scope", "metric")
      .agg(
        safeDiv(covar_pop(db, dv), var_pop(db)).as("slope"),
        avg(dv).as("_dbar"),
        avg(db).as("_xbar"),
        corrSafe(db, dv).as("_r"),
        var_pop(db).as("_xvar"),
        max_by(when(col("is_train"), col("value")), when(col("is_train"), col("bucket"))).as("last_train")
      )
      .withColumn("intercept", col("_dbar") - col("slope") * col("_xbar"))
      .withColumn("rel_mse", coalesce(nanvl(lit(1.0) - col("_r") * col("_r"), lit(0.0)), lit(0.0)))
      .withColumn("reliable", col("rel_mse") <= 0.05 && col("_xvar") > 0)
      .select("scope", "metric", "slope", "intercept", "rel_mse", "last_train", "reliable")
  }

  /** A11 analog (`TimeBucketSimpleRegressionTimeserieAnalyzer.java:12-130`):
    * seasonal profile — bucket each train point into its position within a
    * repeating window (e.g. hour-of-day), average per position, OLS over the
    * (position, avg) profile; gates nBuckets ≥ minBuckets and
    * MSE = SSE/(n−2) ≤ 0.05; classify bounds expected ± max(1σ, 0.05·avg).
    */
  def timeBucketFlags(
      withStats: DataFrame,
      windowSeconds: Long = 86400L,
      targetSeconds: Long = 3600L,
      minBuckets: Int = 24
  ): DataFrame = {
    val fit = timeBucketFit(withStats, windowSeconds, targetSeconds, minBuckets)
      .where(col("reliable"))
      .select("scope", "metric", "slope", "intercept")
    val tb = floor(pmod(col("bucket"), lit(windowSeconds)) / targetSeconds).cast("double")
    val expected = col("intercept") + col("slope") * tb
    val maxErr = greatest(col("train_stddev"), col("train_avg") * 0.05)
    withStats
      .where(!col("is_train"))
      .join(broadcast(fit), Seq("scope", "metric"))
      .select(
        col("scope"),
        col("metric"),
        col("bucket"),
        col("value"),
        expected.as("expected"),
        (expected - maxErr).as("lb"),
        (expected + maxErr).as("rb"),
        (col("value") < expected - maxErr || col("value") > expected + maxErr).as("is_outlier")
      )
      .where(notSuppressed)
  }

  /** A11's per-series seasonal-profile fit with gate columns (exposed for the
    * driver oracle, same rationale as randomWalkFit). MSE per commons-math
    * SimpleRegression.getMeanSquareError = SSE/(n−2) with SSE = n·var(y)·(1−r²).
    */
  def timeBucketFit(
      withStats: DataFrame,
      windowSeconds: Long = 86400L,
      targetSeconds: Long = 3600L,
      minBuckets: Int = 24
  ): DataFrame = {
    val tb = floor(pmod(col("bucket"), lit(windowSeconds)) / targetSeconds).cast("double")
    val prof = withStats
      .where(col("is_train"))
      .groupBy(col("scope"), col("metric"), tb.as("tb"))
      .agg(avg("value").as("bv"))
    prof
      .groupBy("scope", "metric")
      .agg(
        safeDiv(covar_pop(col("tb"), col("bv")), var_pop(col("tb"))).as("slope"),
        avg("bv").as("_ybar"),
        avg("tb").as("_xbar"),
        corrSafe(col("tb"), col("bv")).as("_r"),
        var_pop(col("bv")).as("_yvar"),
        count(lit(1)).as("n_buckets")
      )
      .withColumn("intercept", col("_ybar") - col("slope") * col("_xbar"))
      .withColumn(
        "mse",
        safeDiv(
          col("n_buckets") * col("_yvar") *
            coalesce(nanvl(lit(1.0) - col("_r") * col("_r"), lit(0.0)), lit(0.0)),
          (col("n_buckets") - 2).cast("double")
        )
      )
      .withColumn("reliable", col("n_buckets") >= minBuckets && col("mse") <= 0.05)
      .select("scope", "metric", "slope", "intercept", "mse", "n_buckets", "reliable")
  }

  /** A12 analog (`MultipleLinearRegressionTimeserieAnalyzer.java:13-96` with
    * the single regressor {ts}): OLS with intercept over train points, then
    * the OpenForecast accuracy gates — relMse = MSE/TSS ≤ 0.02 (MSE = mean
    * squared train residual, TSS = Σ(v−avg)², the reference's mean/sum unit
    * mix preserved), MAD ≤ σ when σ>0, MAD ≤ avg — and classify bounds
    * ŷ ± 1.5·σ_train. Two aggregate passes: fit, then residual stats over
    * the train rows; both tiny per series → broadcast to classify.
    */
  def mlrFlags(withStats: DataFrame): DataFrame = {
    val fit = mlrFit(withStats).where(col("reliable")).select("scope", "metric", "slope", "intercept")
    val expected = col("intercept") + col("slope") * col("bucket").cast("double")
    val maxErr = col("train_stddev") * 1.5
    withStats
      .where(!col("is_train"))
      .join(broadcast(fit), Seq("scope", "metric"))
      .select(
        col("scope"),
        col("metric"),
        col("bucket"),
        col("value"),
        expected.as("expected"),
        (expected - maxErr).as("lb"),
        (expected + maxErr).as("rb"),
        (col("value") < expected - maxErr || col("value") > expected + maxErr).as("is_outlier")
      )
      .where(notSuppressed)
  }

  /** A12's per-series fit + gate columns (exposed for the driver oracle) */
  def mlrFit(withStats: DataFrame): DataFrame = {
    val db = when(col("is_train"), col("bucket").cast("double"))
    val dv = when(col("is_train"), col("value"))
    val fit = withStats
      .groupBy("scope", "metric")
      .agg(
        safeDiv(covar_pop(db, dv), var_pop(db)).as("slope"),
        avg(dv).as("_ybar"),
        avg(db).as("_xbar"),
        first("train_avg").as("_tavg"),
        first("train_stddev").as("_tsd")
      )
      .withColumn("intercept", col("_ybar") - col("slope") * col("_xbar"))
    val resid = col("intercept") + col("slope") * col("bucket").cast("double") - col("value")
    withStats
      .where(col("is_train"))
      .join(broadcast(fit), Seq("scope", "metric"))
      .groupBy("scope", "metric")
      .agg(
        first("slope").as("slope"),
        first("intercept").as("intercept"),
        avg(resid * resid).as("mse"),
        avg(abs(resid)).as("mad"),
        sum(pow(col("value") - col("train_avg"), 2.0)).as("tsos"),
        first("train_avg").as("_avg"),
        first("train_stddev").as("_sd")
      )
      .withColumn(
        "reliable",
        !(safeDiv(col("mse"), col("tsos")) > 0.02 && col("tsos") > 0.0) &&
          !(col("_sd") > 0.0 && col("mad") > col("_sd")) &&
          !(col("mad") > col("_avg"))
      )
      .select("scope", "metric", "slope", "intercept", "mse", "mad", "tsos", "reliable")
  }

  /** V2+V3 analog at scale: net score per (scope, bucket) across flag frames
    * — outliers add 3 + magnitude (ln-ratio clamped to [0,3],
    * `TimeserieOutlier.java:56-73`), inliers subtract 1.
    */
  def score(flagFrames: Seq[DataFrame], minScore: Double = 1.0): DataFrame = {
    val all = flagFrames.reduce(_.unionByName(_))
    // safeDiv: a zero bound would throw under ANSI; the kernel maps the
    // resulting Inf/NaN magnitude to 0 (SeriesKernel.scala:244), and null
    // rides through log→coalesce to the same 0.
    val crossed = when(col("value") < col("lb"), abs(safeDiv(col("lb") - col("value"), col("lb"))))
      .otherwise(abs(safeDiv(col("rb") - col("value"), col("rb"))))
    val mag = least(greatest(coalesce(log(crossed), lit(0.0)), lit(0.0)), lit(3.0))
    all
      .withColumn("_contrib", when(col("is_outlier"), lit(3.0) + mag).otherwise(lit(-1.0)))
      .groupBy("scope", "bucket")
      .agg(sum("_contrib").as("score"))
      .where(col("score") >= minScore)
  }

  /** O13 + the V3 expected-errors check at scale
    * (`AbstractDataLoader.java:402-410` re-bucket + dedupe;
    * `:313-320` found/not-found per expected ts): expected outlier
    * timestamps are re-bucketed to the detection resolution, deduped, and
    * left-joined against the flag frames — `matches` = number of OUTLIER
    * records at that bucket, `score` = the net V3 score (no minScore gate:
    * the reference reports the raw score for expected errors), `found` =
    * matches ≥ 1. Expected rows with no flags at all get matches 0 /
    * score 0 (the reference NPEs there — `int matches = map.get(ts)` on a
    * missing key; reported as not-found instead of crashing).
    *
    * `expected` needs columns (scope, ts). The expected set is tiny relative
    * to the data (labels), so it broadcasts; the flag aggregation is a
    * partial+final hash agg on (scope, bucket).
    */
  def expectedErrorReport(
      flagFrames: Seq[DataFrame],
      expected: DataFrame,
      resolution: Long,
      outlierScore: Double = 3.0,
      inlierScore: Double = 1.0
  ): DataFrame = {
    val all = flagFrames.reduce(_.unionByName(_))
    // same zero-bound guard as score(): ANSI-safe, kernel-equivalent (Inf/NaN → 0)
    val crossed = when(col("value") < col("lb"), abs(safeDiv(col("lb") - col("value"), col("lb"))))
      .otherwise(abs(safeDiv(col("rb") - col("value"), col("rb"))))
    val mag = least(greatest(coalesce(nanvl(log(crossed), lit(0.0)), lit(0.0)), lit(0.0)), lit(outlierScore))
    val perBucket = all
      .withColumn(
        "_contrib",
        when(col("is_outlier"), lit(outlierScore) + mag).otherwise(lit(-inlierScore))
      )
      .groupBy("scope", "bucket")
      .agg(
        sum("_contrib").as("score"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("matches")
      )
    val want = expected
      .select(col("scope"), (col("ts") - pmod(col("ts"), lit(resolution))).as("bucket"))
      .distinct()
    broadcast(want)
      .join(perBucket, Seq("scope", "bucket"), "left_outer")
      .select(
        col("scope"),
        col("bucket").as("ts"),
        coalesce(col("matches"), lit(0L)).as("matches"),
        coalesce(col("score"), lit(0.0)).as("score"),
        (coalesce(col("matches"), lit(0L)) >= 1).as("found")
      )
  }
}
