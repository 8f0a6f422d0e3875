package graft.streaming

import graft.kernel.{AnalyzerRegistry, Pt, ScopePipeline}
import graft.model.{EngineConfig, Validated}
import graft.spark.Detect
import graft.spark.Detect.SeriesPoint
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming detection (north_star: custom state via
  * `flatMapGroupsWithState`): per-scope state holds the accumulated series
  * (bounded by cfg.maxSeriesPoints — the auto-rollup ladder keeps processed
  * series small, and a scope whose RAW stream exceeds the bound drops its
  * oldest buckets, mirroring tier TTL); every micro-batch re-runs the exact
  * kernel pipeline over the scope's series and emits the CURRENT validated
  * outliers for scopes that received data (update-style semantics: a
  * downstream consumer keeps the latest record per (scope, ts)). The
  * validated records carry the SAME reference-shaped details JSON as the
  * batch path (`Detect.validatedForScope`) — switching between batch and
  * streaming loses no payload.
  *
  * Idle-scope EVICTION: a scope that receives no data for `idleTimeoutMs`
  * of processing time has its state removed (ProcessingTimeTimeout). A
  * months-long stream over a churning scope population would otherwise grow
  * state without bound — dead scopes' series pinned in the state store
  * forever. An evicted scope that later receives data simply starts a fresh
  * series (identical to a newly seen scope).
  *
  * Input rows must be finalized series points — e.g. the output of
  * `StreamingDerive.deriveStream`, whose watermark emits each window once.
  *
  * Draining caveat: ProcessingTimeTimeout makes the micro-batch engine
  * schedule no-data batches indefinitely (each batch may need to evict
  * expired state), so a detect stream has no natural end of work:
  * `processAllAvailable()` NEVER returns (measured), and a
  * `Trigger.AvailableNow` query churns through timer-only batches instead
  * of stopping promptly after its data. To drain one, monitor
  * `StreamingQuery.recentProgress` until the expected `numInputRows` have
  * been ingested (their batches are then committed), and call `stop()` —
  * accumulate the counts per `batchId` (recentProgress is a bounded ring
  * buffer; a long drain's timer-only batches evict the data batches'
  * entries) or use a StreamingQueryListener. For continuous operation use
  * a ProcessingTime trigger as usual.
  */
object StreamingDetect {

  final case class ScopeState(points: Array[SeriesPoint])

  /** bound a scope's accumulated series: keep the newest buckets per
    * metric. The per-metric budget is FLOORED at 1: with more distinct
    * metrics than `maxSeriesPoints` the integer quotient is 0 and
    * takeRight(0) would silently wipe every series each batch, permanently
    * disabling detection for the scope — slightly exceeding the configured
    * cap is the strictly better failure. Extracted for direct spec coverage.
    */
  private[streaming] def boundState(merged: Array[SeriesPoint], maxSeriesPoints: Int): Array[SeriesPoint] =
    if (merged.length <= maxSeriesPoints) merged
    else {
      val perMetric = math.max(1, maxSeriesPoints / math.max(1, merged.map(_.metric).distinct.length))
      merged
        .groupBy(_.metric)
        .values
        .flatMap(ps => ps.sortBy(_.bucket).takeRight(perMetric))
        .toArray
        .sortBy(p => (p.metric, p.bucket))
    }

  def detectStream(
      derived: Dataset[SeriesPoint],
      cfg: EngineConfig,
      idleTimeoutMs: Long = 6L * 3600 * 1000
  ): Dataset[Validated] = {
    val spark = derived.sparkSession
    import spark.implicits._
    derived
      .groupByKey(_.scope)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (scope: String, rows: Iterator[SeriesPoint], state: GroupState[ScopeState]) => {
          if (state.hasTimedOut) {
            state.remove() // idle scope: free its series from the state store
            Iterator.empty
          } else {
            val prev = state.getOption.map(_.points).getOrElse(Array.empty[SeriesPoint])
            // merge new finalized windows; a re-delivered (metric, bucket) pair
            // overwrites (idempotent against foreachBatch replays)
            val merged = (prev ++ rows)
              .groupBy(p => (p.metric, p.bucket))
              .map(_._2.last)
              .toArray
              .sortBy(p => (p.metric, p.bucket))
            val bounded = boundState(merged, cfg.maxSeriesPoints)
            state.update(ScopeState(bounded))
            state.setTimeoutDuration(idleTimeoutMs)

            val raw: Map[String, Iterable[Pt]] =
              bounded.groupBy(_.metric).map { case (m, ps) => m -> ps.map(p => Pt(p.bucket, p.value)).toIndexedSeq }
            val processed = ScopePipeline.process(raw, cfg)
            if (processed.series.isEmpty) Iterator.empty
            else {
              val flags = AnalyzerRegistry.all.flatMap(_.analyze(scope, processed.series.values))
              // batch-identical payload: score gate + full details JSON
              Detect.validatedForScope(scope, flags, processed, cfg.minScore)
            }
          }
        }
      )
  }

  /** convenience: long-row streaming DataFrame → typed points */
  def toPoints(df: DataFrame): Dataset[SeriesPoint] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("scope", "metric", "bucket", "value").as[SeriesPoint]
  }
}
