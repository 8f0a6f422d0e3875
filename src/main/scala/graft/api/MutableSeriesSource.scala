package graft.api

import graft.kernel.{AnalyzerRegistry, KAnalyzer, Pt, ScopePipeline}
import graft.model.{EngineConfig, Flag}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** S4 — the public programmatic source, analog of the reference
  * `MutableDataLoader` (`MutableDataLoader.java:9-53`): build a scope's
  * series in memory (`addData`), attach expected-error labels
  * (`addExpectedError`), then `load()` → `analyze()` → `validate()` with the
  * same per-scope semantics as the file loader. Raw entries are stored as
  * STRINGS keyed by the ts spelling, exactly the reference's
  * `HashMap<String, String>` (`MutableDataLoader.java:12,45-49`): duplicate
  * ts STRINGS overwrite (HashMap.put), but distinct spellings of one
  * numeric ts (e.g. "0100" and "100") coexist and bucket-SUM at load, and
  * parsing happens only at load with the reference's exact tokenizers
  * (`AbstractDataLoader.processData`: `Long.parseLong` is strict — " 100"
  * throws — while `Double.parseDouble` accepts surrounding whitespace).
  *
  * One instance = one scope (one reference data-loader). For cluster-scale
  * input use `toPoints`, which bridges the accumulated series into the
  * distributed path (`spark.Detect` / `pipeline.SeriesOps`).
  */
final class MutableSeriesSource(name: String, baseConfig: EngineConfig = EngineConfig()) {

  private val settings = mutable.Map.empty[String, String]
  private val rawSeries = mutable.Map.empty[String, mutable.Map[String, String]]
  private val expectedErrors = mutable.ArrayBuffer.empty[Long]

  private var processed: Option[ScopePipeline.Processed] = None
  private var flags: Option[Seq[Flag]] = None

  settings("name") = name // `MutableDataLoader(name)` ctor: setConfig("name", name)

  // the reference applies these two fields EAGERLY in their setters, so the
  // LAST mutation wins regardless of which API spelled it
  // (`AbstractDataLoader.java:57-72`); everything else resolves in `config`
  private var resolutionOverride: Option[Long] = None
  private var forecastOverride: Option[Long] = None

  /** `AbstractDataLoader.setConfig`: stores the setting; ONLY `rollup`
    * (case-insensitive) is applied — parsed EAGERLY, so a malformed value
    * throws here, not at `load()` (`AbstractDataLoader.java:57-62`). Every
    * other key — including `forecast_periods` — is stored but inert, exactly
    * like the reference (only [[setForecastPeriods]] changes that field).
    */
  def setConfig(key: String, value: String): Unit = {
    settings(key) = value
    if (key.equalsIgnoreCase("rollup")) resolutionOverride = Some(java.lang.Long.parseLong(value))
  }

  /** `AbstractDataLoader.getConfig(k, d)` (`AbstractDataLoader.java:74-76`) */
  def getConfig(key: String, default: String): String = settings.getOrElse(key, default)

  /** `AbstractDataLoader.setForecastPeriods`: the ONLY way a reference user
    * changes the train/classify split (`AbstractDataLoader.java:64-67`)
    */
  def setForecastPeriods(x: Int): Unit = {
    settings("forecast_periods") = x.toString
    forecastOverride = Some(x.toLong)
  }

  /** `AbstractDataLoader.setDesiredTimeResolution`
    * (`AbstractDataLoader.java:69-72`): same field as `setConfig("rollup")`,
    * last call wins
    */
  def setDesiredTimeResolution(x: Int): Unit = {
    settings("desired_time_resolution") = x.toString
    resolutionOverride = Some(x.toLong)
  }

  /** reference-style string API (`MutableDataLoader.addData(serie, ts, val)`):
    * the raw spelling is KEPT; malformed tokens surface at load, not here
    */
  def addData(serie: String, ts: String, value: String): Unit =
    rawSeries.getOrElseUpdate(serie, mutable.Map.empty)(ts) = value

  def addData(serie: String, ts: Long, value: Double): Unit =
    addData(serie, ts.toString, value.toString)

  /** bulk add (`MutableDataLoader.addData(serie, HashMap)`): putAll — every
    * entry lands as if added individually; existing spellings overwrite
    */
  def addData(serie: String, values: Map[String, String]): Unit = {
    val m = rawSeries.getOrElseUpdate(serie, mutable.Map.empty)
    values.foreach { case (t, v) => m(t) = v }
  }

  def addExpectedError(ts: Long): Unit = expectedErrors += ts

  def addExpectedErrors(ts: Seq[Long]): Unit = expectedErrors ++= ts

  /** effective config = base + extension settings ([[EngineConfig.fromSettings]])
    * + the eagerly-applied reference fields, which carry LAST-mutation-wins
    * semantics that a map can't (e.g. `setConfig("rollup", …)` after
    * `setDesiredTimeResolution` overwrites it, and vice versa).
    * `desired_time_resolution` is dropped before `fromSettings` (whose
    * rollup-absent fallback on it is a SIDECAR-path extension): on this
    * reference-mirroring API the key is inert via `setConfig`, exactly like
    * the reference, and applies only through [[setDesiredTimeResolution]] —
    * whose effect rides on `resolutionOverride`, not the map.
    */
  def config: EngineConfig = {
    val c = EngineConfig.fromSettings(settings.toMap.filter(!_._1.equalsIgnoreCase("desired_time_resolution")), baseConfig)
    val cr = resolutionOverride.fold(c)(r => c.copy(resolution = r))
    forecastOverride.fold(cr)(f => cr.copy(forecastPeriods = f))
  }

  /** one raw entry parsed the way `AbstractDataLoader.processData` does
    * (`AbstractDataLoader.java:130-136`)
    */
  private def parseEntry(t: String, v: String): Pt =
    Pt(java.lang.Long.parseLong(t), java.lang.Double.parseDouble(v))

  /** `AbstractDataLoader.load()`: process all series (bucket → gap-fill →
    * alert policy → rollup ladder → error_rate → auto-normalize).
    */
  def load(): this.type = {
    val raw: Map[String, Iterable[Pt]] =
      rawSeries.toMap.map { case (serie, m) =>
        serie -> m.toSeq.map { case (t, v) => parseEntry(t, v) }.sortBy(_.ts)
      }
    processed = Some(ScopePipeline.process(raw, config))
    flags = None
    this
  }

  /** processed (bucketed, gap-filled, possibly rolled-up and normalized)
    * series of the loaded scope: serie → (bucket ts → value). Ergonomic
    * accessor the reference lacks (its `timeseries` map is a private field,
    * `AbstractDataLoader.java:18`); loads on demand like `analyze`.
    */
  def processedSeries: Map[String, Map[Long, Double]] =
    processedOrLoad().series.view.mapValues(_.data.iterator.map(p => p.ts -> p.v).toMap).toMap

  /** final bucket resolution after the auto-rollup ladder (the reference's
    * `targetTsStepResolution` once `load()` ran)
    */
  def resolution: Long = processedOrLoad().resolution

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
      .flatMap { case (serie, m) =>
        m.toSeq.map { case (t, v) => val p = parseEntry(t, v); (name, serie, p.ts, p.v) }
      }
      .toDF("scope", "metric", "bucket", "value")
  }
}
