package graft.api

import graft.kernel.{AnalyzerRegistry, KAnalyzer, Pt, ScopePipeline}
import graft.model.{EngineConfig, Flag}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** S4 — the public programmatic source, analog of the reference
  * `MutableDataLoader` (`MutableDataLoader.java:9-53`): build a scope's
  * series in memory (`addData`), attach expected-error labels
  * (`addExpectedError`), then `load()` → `analyze()` → `validate()` with the
  * same per-scope semantics as the file loader. Duplicate (serie, ts) adds
  * overwrite (reference HashMap.put), string timestamps/values are parsed at
  * load like `AbstractDataLoader.processData`.
  *
  * One instance = one scope (one reference data-loader). For cluster-scale
  * input use `toPoints`, which bridges the accumulated series into the
  * distributed path (`spark.Detect` / `pipeline.SeriesOps`).
  */
final class MutableSeriesSource(name: String, baseConfig: EngineConfig = EngineConfig()) {

  private val settings = mutable.Map.empty[String, String]
  private val rawSeries = mutable.Map.empty[String, mutable.Map[Long, Double]]
  private val expectedErrors = mutable.ArrayBuffer.empty[Long]

  private var processed: Option[ScopePipeline.Processed] = None
  private var flags: Option[Seq[Flag]] = None

  def setConfig(key: String, value: String): Unit = settings(key) = value

  /** reference-style string API (`MutableDataLoader.addData(serie, ts, val)`) */
  def addData(serie: String, ts: String, value: String): Unit =
    addData(serie, ts.trim.toLong, value.trim.toDouble)

  def addData(serie: String, ts: Long, value: Double): Unit =
    rawSeries.getOrElseUpdate(serie, mutable.Map.empty)(ts) = value

  def addExpectedError(ts: Long): Unit = expectedErrors += ts

  def addExpectedErrors(ts: Seq[Long]): Unit = expectedErrors ++= ts

  /** effective config = base overridden by `setConfig` settings (S3 wiring) */
  def config: EngineConfig = EngineConfig.fromSettings(settings.toMap, baseConfig)

  /** `AbstractDataLoader.load()`: process all series (bucket → gap-fill →
    * alert policy → rollup ladder → error_rate → auto-normalize).
    */
  def load(): this.type = {
    val raw: Map[String, Iterable[Pt]] =
      rawSeries.toMap.map { case (serie, m) => serie -> m.toSeq.sortBy(_._1).map { case (t, v) => Pt(t, v) } }
    processed = Some(ScopePipeline.process(raw, config))
    flags = None
    this
  }

  private def processedOrLoad(): ScopePipeline.Processed = {
    if (processed.isEmpty) load()
    processed.get
  }

  /** run analyzers over the processed series → outlier/inlier flags */
  def analyze(analyzers: Seq[KAnalyzer] = AnalyzerRegistry.all): Seq[Flag] = {
    val f = analyzers.flatMap(_.analyze(name, processedOrLoad().series.values))
    flags = Some(f)
    f
  }

  private def flagsOrAnalyze(): Seq[Flag] = {
    if (flags.isEmpty) analyze()
    flags.get
  }

  /** V3 scoring: per-ts net score ≥ minScore (`AbstractDataLoader.validate`) */
  def validate(minScore: Double = 1.0): Seq[(Long, Double)] =
    ScopePipeline.score(flagsOrAnalyze(), minScore).toSeq.sortBy(_._1)

  /** O13: found/not-found report for the added expected errors, re-bucketed
    * to the final (possibly ladder-coarsened) resolution.
    */
  def expectedReport(): Seq[(Long, Long, Double, Boolean)] =
    ScopePipeline.expectedReport(flagsOrAnalyze(), expectedErrors.toSeq, processedOrLoad().resolution)

  /** bridge to the distributed path: the accumulated RAW series as long rows
    * (scope, metric, bucket, value) — feed to SeriesOps / Detect.
    */
  def toPoints(spark: SparkSession): DataFrame = {
    import spark.implicits._
    rawSeries.toSeq
      .flatMap { case (serie, m) => m.toSeq.map { case (t, v) => (name, serie, t, v) } }
      .toDF("scope", "metric", "bucket", "value")
  }
}
