package graft.kernel

import graft.model.{EngineConfig, Flag, NormalizationMode}
import scala.collection.immutable.ListMap

/** Per-scope (per data-loader) pipeline — the kernel equivalent of the
  * reference `AbstractDataLoader.processData/analyze/validate`
  * (`AbstractDataLoader.java:123-381`). One scope = one bundle of named
  * series (reference: one file / one loader). Pure; runs inside a Spark
  * per-scope group at scale.
  */
object ScopePipeline {

  /** Result of processing one scope's raw points. `resolution` is the final
    * (possibly auto-rolled-up) step resolution.
    */
  final case class Processed(series: ListMap[String, KSeries], resolution: Long)

  /** `processData` (`AbstractDataLoader.java:123-201`) over raw per-series
    * points: parse-bucket-dedup(sum) → gap-fill → skip empty → alert policy →
    * auto-rollup ladder → derive error_rate → auto log-normalize.
    * Series map iteration order is pinned to insertion order (reference uses
    * HashMap order, immaterial on the corpus — SURVEY §5.2-Q4/Q6).
    */
  def process(raw: Map[String, Iterable[Pt]], cfg: EngineConfig): Processed = {
    var res = cfg.resolution
    var series = ListMap.empty[String, KSeries]

    // deterministic series order: "regular" first (it is the ladder decider —
    // SURVEY §5.2-Q4), then lexicographic.
    val names = raw.keys.toSeq.sortBy(n => (if (n == "regular") "" else n))
    for (name <- names) {
      val normalized =
        if (cfg.normalization == NormalizationMode.None) raw(name)
        else raw(name).map(p => Pt(p.ts, SeriesKernel.normalizeValue(cfg.normalization, p.v)))
      val bucketed = SeriesKernel.bucketSum(normalized, res)
      val filled = SeriesKernel.gapFill(bucketed, res, cfg.gapFill)
      // robustness divergence (documented): the reference throws when a
      // series has fewer points than forecastPeriods (`Timeseries.java:70-72`),
      // killing the whole loader; at scale one degenerate conversation must
      // not fail the job, so such series are skipped instead. The fixture
      // corpus never triggers this (all series ≥ 18 points).
      if (filled.nonEmpty && filled.length >= cfg.forecastPeriods) {
        val ks0 = KSeries(name, filled, cfg.forecastPeriods)
        // `AbstractDataLoader.java:185-187`: "error" alerts on over only
        val ks = if (name == "error") ks0.withAlertPolicy(over = true, under = false) else ks0
        series = series.updated(name, ks)
      }
    }

    // auto-rollup ladder (`AbstractDataLoader.java:263-287`): decided by the
    // first series, applied to all, repeated until no step fires.
    if (cfg.autoRollup && series.nonEmpty) {
      val decider = series.head._2.name
      var continue = true
      while (continue) {
        val size = series(decider).data.length.toLong
        val next = SeriesKernel.nextLadderResolution(size, res)
        if (next == res) continue = false
        else {
          res = next
          series = series.map { case (n, s) => n -> s.rollup(res) }
        }
      }
    }

    // derive error_rate (`AbstractDataLoader.java:233-261`)
    if (cfg.deriveErrorRate && series.contains("regular") && series.contains("error")) {
      val regular = series("regular")
      val error = series("error")
      val minAvgTh = 10.0
      if (regular.stats.avg >= minAvgTh && error.stats.avg >= minAvgTh) {
        val errMap = error.data.map(p => p.ts -> p.v).toMap
        val ratePts = SeriesKernel.errorRate(regular.data, errMap)
        val rate = KSeries("error_rate", ratePts, cfg.forecastPeriods)
          .withAlertPolicy(over = true, under = false)
        series = series.updated("error_rate", rate)
      }
    }

    // auto log-normalize (`AbstractDataLoader.java:203-224`): only when the
    // global mode is NONE; per series, if trainMax - trainMin >= 1000 rewrite
    // every point with LOG.
    if (cfg.autoNormalize && cfg.normalization == NormalizationMode.None) {
      series = series.map { case (n, s) =>
        if (s.stats.maxVal - s.stats.minVal >= 1000.0)
          n -> s.withData(s.data.map(p => Pt(p.ts, SeriesKernel.normalizeValue(NormalizationMode.Log, p.v))))
        else n -> s
      }
    }

    Processed(series, res)
  }

  /** V3 scoring (`AbstractDataLoader.validate`,
    * `AbstractDataLoader.java:295-381`): per ts,
    * score = Σ_outliers (outlierScore + magnitude) − Σ_inliers inlierScore;
    * emit every ts with score ≥ minScore. Contributions are summed in a
    * canonical (analyzer, metric) order (SURVEY §5.2-Q6) for stable doubles.
    */
  def score(flags: Seq[Flag], minScore: Double): Map[Long, Double] =
    scoreAll(flags).filter(_._2 >= minScore)

  /** per-ts net scores WITHOUT the minScore gate (the expected-errors check
    * reports raw scores, `AbstractDataLoader.java:313-320`).
    */
  def scoreAll(flags: Seq[Flag]): Map[Long, Double] = {
    val byTs = flags.groupBy(_.ts)
    byTs.map { case (ts, fs) =>
      var s = 0.0
      // reference order: all outlier contributions first, then inliers
      // (`AbstractDataLoader.java:301-309`); within each, canonical order.
      for (f <- fs.sortBy(f => (!f.isOutlier, f.analyzer, f.metric))) {
        if (f.isOutlier)
          s += f.outlierScore + SeriesKernel.outlierMagnitude(f.value, f.lb, f.rb, f.outlierScore)
        else s -= f.inlierScore
      }
      ts -> s
    }
  }

  /** One outlier record of the validated-details payload — field-for-field
    * the reference `TimeserieOutlier.getJsonObjectWithDetails`
    * (`TimeserieOutlier.java:74-85`).
    */
  final case class OutlierDetail(
      serieName: String,
      timestamp: Long,
      analyzerName: String,
      measuredValue: Double,
      expectedValue: Double,
      leftBound: Double,
      rightBound: Double,
      magnitude: Double
  )

  /** The validated-details payload (`AbstractDataLoader.java:334-368`):
    * ALL outlier records of the scope (the reference attaches the same full
    * list to every validated ts) + the last-10-point snapshot of every
    * processed series, values ascending by ts. Outliers in canonical
    * (analyzer, serie, ts) order — the reference's insertion order depends on
    * analyzer scheduling, so a stable order is used for determinism.
    */
  def detailsPayload(
      flags: Seq[Flag],
      series: ListMap[String, KSeries]
  ): (Seq[OutlierDetail], Seq[(String, Seq[Double])]) = {
    val outliers = flags
      .filter(_.isOutlier)
      .sortBy(f => (f.analyzer, f.metric, f.ts))
      .map { f =>
        OutlierDetail(
          f.metric,
          f.ts,
          f.analyzer,
          f.value,
          f.expected,
          f.lb,
          f.rb,
          SeriesKernel.outlierMagnitude(f.value, f.lb, f.rb, f.outlierScore)
        )
      }
    val snaps = series.toSeq.map { case (n, s) => n -> s.data.takeRight(10).map(_.v).toSeq }
    (outliers, snaps)
  }

  /** O13 (`AbstractDataLoader.java:402-410`, `:313-320`): re-bucket the raw
    * expected-error timestamps to the final resolution, dedupe preserving
    * first occurrence, then report per expected ts: (ts, outlier matches,
    * net score, found). Missing entries are reported as not-found with
    * matches 0 / score 0 (the reference unboxes a null Integer there — an
    * NPE on any genuinely-missed expected error; divergence documented).
    */
  def expectedReport(flags: Seq[Flag], rawExpected: Seq[Long], resolution: Long): Seq[(Long, Long, Double, Boolean)] = {
    val rebucketed = rawExpected.map(ts => ts - ts % resolution).distinct
    val outlierCounts = flags.filter(_.isOutlier).groupBy(_.ts).map { case (ts, fs) => ts -> fs.size.toLong }
    val scores = scoreAll(flags)
    rebucketed.map { ts =>
      val matches = outlierCounts.getOrElse(ts, 0L)
      (ts, matches, scores.getOrElse(ts, 0.0), matches >= 1)
    }
  }
}
