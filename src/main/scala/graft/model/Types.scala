package graft.model

import java.sql.Timestamp

/** Core row/record types of the engine.
  *
  * Input schema per BASELINE.json `input_hint`: an Iceberg-shaped table of
  * multi-turn conversation / agent transcripts. Offline realization is
  * partitioned Parquet + manifest JSON (no Iceberg runtime in this sandbox).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // nullable
    ts: Timestamp
)

/** One timeseries point. A series is identified by (scope, metric):
  * scope = conversation id / fixture name (reference: one data-loader),
  * metric = series name within the scope (reference: "regular", "error", ...).
  * `bucket` is the epoch-second bucket start (ts - ts % resolution).
  */
final case class Point(scope: String, metric: String, bucket: Long, value: Double)

/** Per-series train statistics — mirrors the cached stats of the reference
  * `Timeseries` (`Timeseries.java:14-17`): population stddev, min/max with the
  * reference's exact `Double.MIN_VALUE` / `Double.MAX_VALUE` seeding quirk.
  */
final case class TrainStats(avg: Double, stdDev: Double, minVal: Double, maxVal: Double, n: Long)

/** An outlier or inlier flag emitted by an analyzer — union of the reference
  * `TimeserieOutlier` / `TimeserieInlier` (`TimeserieOutlier.java:8-26`).
  */
final case class Flag(
    scope: String,
    metric: String,
    analyzer: String,
    ts: Long,
    value: Double,
    expected: Double,
    lb: Double,
    rb: Double,
    isOutlier: Boolean,
    outlierScore: Double,
    inlierScore: Double
)

/** A validated (scored) outlier per (scope, ts) — reference
  * `ValidatedTimeserieOutlier` (`ValidatedTimeserieOutlier.java:8-32`).
  */
final case class Validated(scope: String, ts: Long, score: Double, details: String)

/** Value normalization modes (`ValueNormalizationModes.java:6-8`). */
object NormalizationMode extends Enumeration {
  val None, Log, Log10, LogNatural, Sqrt = Value
}

/** Gap-fill strategies. Reference behavior is Zero
  * (`AbstractDataLoader.java:167`); Locf and Linear are north_star
  * extensions, config-gated, never on in parity mode.
  */
object GapFillMode extends Enumeration {
  val Zero, Locf, Linear = Value
}

/** Engine configuration, mirroring the reference's settings keys
  * (`AbstractDataLoader.java:29-31,57-76`).
  */
final case class EngineConfig(
    resolution: Long = 60, // targetTsStepResolution
    forecastPeriods: Long = 10,
    normalization: NormalizationMode.Value = NormalizationMode.None,
    gapFill: GapFillMode.Value = GapFillMode.Zero,
    autoRollup: Boolean = true,
    autoNormalize: Boolean = true,
    deriveErrorRate: Boolean = true,
    minScore: Double = 1.0,
    /** guard for per-series in-memory analysis (post-rollup series are small) */
    maxSeriesPoints: Int = 2000000
)

object EngineConfig {

  /** S3 wiring (`AbstractDataLoader.setConfig`, `AbstractDataLoader.java:57-76`):
    * build a config from a flat settings map (e.g. a `.settings` sidecar).
    * Resolution precedence is FIXED, never map-iteration-order: `rollup` is
    * the reference's settings-path key (`setConfig` honors ONLY it,
    * `AbstractDataLoader.java:59-62`); `desired_time_resolution` is stored
    * but ignored by the reference's settings path (only the programmatic
    * `setDesiredTimeResolution` applies it) — here it is honored as an
    * ergonomic extension when `rollup` is absent.
    * `forecast_periods` is deliberately INERT here, exactly like the
    * reference's settings path: `setConfig` stores it but never applies it —
    * only the programmatic `setForecastPeriods` changes the field
    * (`AbstractDataLoader.java:64-67`), mirrored by
    * [[graft.api.MutableSeriesSource.setForecastPeriods]] and the
    * `forecastPeriods` field of `base`.
    * Extensions (the reference's normalization mode is a hardcoded
    * "@todo Configure" field, `AbstractDataLoader.java:31`): `normalization`
    * (none|log|log10|log1p|sqrt), `gap_fill` (zero|locf|linear), `min_score`.
    * Unknown keys are ignored, like the reference's settings map.
    */
  def fromSettings(settings: Map[String, String], base: EngineConfig = EngineConfig()): EngineConfig = {
    var cfg = base
    // iterate in sorted key order so that case-variant duplicates of one
    // logical key ("Rollup" + "rollup") resolve deterministically (last in
    // lexicographic order wins) instead of by Map hash-iteration order
    val ordered = settings.toSeq.sortBy(_._1)
    val lower = ordered.map { case (k, v) => k.toLowerCase -> v }.toMap
    lower
      .get("rollup")
      .orElse(lower.get("desired_time_resolution"))
      .foreach(v => cfg = cfg.copy(resolution = v.toLong))
    for ((k, v) <- ordered) k.toLowerCase match {
      case "rollup" | "desired_time_resolution" => () // applied above with fixed precedence
      case "forecast_periods"                   => () // stored-but-inert, like reference setConfig
      case "min_score"                          => cfg = cfg.copy(minScore = v.toDouble)
      case "normalization" =>
        cfg = cfg.copy(normalization = v.toLowerCase match {
          case "log"   => NormalizationMode.Log
          case "log10" => NormalizationMode.Log10
          case "log1p" => NormalizationMode.LogNatural
          case "sqrt"  => NormalizationMode.Sqrt
          case _       => NormalizationMode.None
        })
      case "gap_fill" =>
        cfg = cfg.copy(gapFill = v.toLowerCase match {
          case "locf"   => GapFillMode.Locf
          case "linear" => GapFillMode.Linear
          case _        => GapFillMode.Zero
        })
      case _ => ()
    }
    cfg
  }
}
