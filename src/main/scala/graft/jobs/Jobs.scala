package graft.jobs

import graft.model.EngineConfig
import graft.spark.Detect
import graft.store.{TableStore, TierBuilder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry points (north_rule: jobs run via spark-submit with
  * AQE-tuned shuffles and per-partition checkpoint manifests).
  */
object Jobs {
  def session(appName: String): SparkSession = {
    val b = SparkSession.builder().appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // master comes from spark-submit; default for bare `java -cp` runs
    (if (sys.props.contains("spark.master")) b else b.master("local[*]")).getOrCreate()
  }

  /** escape a string value for interpolation into the machine-readable
    * JSON report lines (runAll/cron parse them): a tier, cutoff, or path
    * carrying a quote/backslash/control char must emit a well-formed line,
    * not corrupt the channel — same class of guard as the ledger's
    * tab/newline rejection at the commit boundary.
    */
  private[graft] def jsonStr(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.result()
  }
}

/** Rollup: transcripts parquet → raw/1m/1h/1d tier stores with lineage
  * manifests; resumable (re-invoking after a kill skips completed
  * partitions of the same input snapshot).
  *
  * Usage: Rollup <transcriptsPath> <storeBase> <inputSnapshotId>
  */
object Rollup {
  def main(args: Array[String]): Unit = {
    val Array(transcriptsPath, storeBase, inputSnapshot) = args.take(3)
    val spark = Jobs.session("graft-rollup")
    spark.sparkContext.setLogLevel("WARN")
    val turns = spark.read.parquet(transcriptsPath)
    val snaps = TierBuilder.build(spark, turns, storeBase, inputSnapshot)
    snaps.toSeq.sortBy(_._1).foreach { case (tier, s) =>
      println(
        s"""{"tier":"${Jobs.jsonStr(tier)}","snapshot":${s.snapshotId},"input":"${Jobs.jsonStr(s.inputSnapshot)}","partitions":${s.partitions.size},"rows":${s.partitions.map(_.rows).sum}}"""
      )
    }
    spark.stop()
  }
}

/** Store maintenance (the nightly companion of streaming ingestion at
  * 100 TB): per tier, optionally TTL-demote partitions older than a cutoff
  * (pure metadata commit — the coarser tier must already cover them),
  * compact partitions fragmented past `maxFiles` (foreachBatch appends
  * accumulate one file per micro-batch per task — a scan-planning and
  * listing tax), then expire snapshots, physically reclaiming files no kept
  * snapshot references. Every step is a snapshot-isolated commit: concurrent
  * readers and writers are never disturbed, and a compaction racing a
  * rewrite aborts cleanly (TableStore validation).
  *
  * Usage (flag form — multi-tier, tunable watermark guard):
  *   Maintain <storeBase> --tiers raw,1h,1d [--max-files 8] [--keep-snapshots 3]
  *            [--ttl-cutoff <day>] [--watermark-max-age-days 7]
  *            [--lock-ttl-minutes 30] [--orphan-gate-hours 24]
  *            [--min-snapshot-age-hours 0]
  * Legacy positional form still accepted:
  *   Maintain <storeBase> <tier> [maxFiles=8] [keepSnapshots=3] [ttlCutoff]
  */
object Maintain {
  final case class Report(
      compacted: Int,
      filesReclaimed: Int,
      watermarksGCed: Int,
      ttlSnapshot: Option[Long] = None,
      ttlPartitions: Option[Int] = None
  )

  final case class Args(
      storeBase: String,
      tiers: Seq[String],
      maxFiles: Int = 8,
      keepSnapshots: Int = 3,
      ttlCutoff: Option[String] = None,
      // single-sourced from the store (see TableStore.DefaultWatermarkMaxAgeMs);
      // operators with slow streams widen it via --watermark-max-age-days
      watermarkMaxAgeMs: Long = TableStore.DefaultWatermarkMaxAgeMs,
      // store lease/orphan tunables (TableStore constructor params): widen
      // the lock TTL when a maintenance op can legitimately stall longer,
      // and the orphan gate when a single commit can run longer than a day
      lockTtlMs: Long = TableStore.DefaultMaintenanceLockTtlMs,
      orphanGateMs: Long = TableStore.DefaultOrphanFileGateMs,
      // reader grace (Iceberg olderThan): snapshots younger than this are
      // kept beyond keepSnapshots so a long read job's resolved file set
      // survives fast streaming commit churn; 0 = count-only
      minSnapshotAgeMs: Long = 0L
  )

  private val usage =
    "Usage: Maintain <storeBase> --tiers t1[,t2,...] [--max-files N] [--keep-snapshots N] " +
      "[--ttl-cutoff day] [--watermark-max-age-days D] [--lock-ttl-minutes M] [--orphan-gate-hours H] " +
      "[--min-snapshot-age-hours H] | " +
      "Maintain <storeBase> <tier> [maxFiles] [keepSnapshots] [ttlCutoff]"

  /** flag form and the legacy positional form (any `--` switch selects flags) */
  private[jobs] def parseArgs(args: Array[String]): Args = {
    require(args.length >= 2, usage)
    // a forgotten storeBase would otherwise make "--tiers" the base path and
    // the run a silent no-op against a nonexistent store — cron would report
    // healthy "done" lines while the real store never gets maintained
    require(!args(0).startsWith("--"), s"first argument must be <storeBase>, got ${args(0)}\n$usage")
    val rest = args.drop(1)
    if (rest.exists(_.startsWith("--"))) {
      var a = Args(args(0), Seq.empty)
      var i = 0
      // zero/negative durations don't tune the safety mechanisms, they
      // DISABLE them (gate 0 ⇒ expiry eats in-flight commits, TTL 0 ⇒ every
      // live lease is instantly stealable) — a typo must fail at parse, not
      // silently run unsafe. NaN fails the same check (NaN > 0 is false).
      def positive(flag: String, v: Double): Double = {
        require(v > 0, s"$flag must be positive, got $v\n$usage")
        v
      }
      while (i < rest.length) {
        require(i + 1 < rest.length, s"missing value for ${rest(i)}\n$usage")
        rest(i) match {
          case "--tiers"                  => a = a.copy(tiers = rest(i + 1).split(',').toSeq.filter(_.nonEmpty))
          case "--max-files"              => a = a.copy(maxFiles = positive("--max-files", rest(i + 1).toInt).toInt)
          case "--keep-snapshots"         => a = a.copy(keepSnapshots = positive("--keep-snapshots", rest(i + 1).toInt).toInt)
          case "--ttl-cutoff"             => a = a.copy(ttlCutoff = Some(rest(i + 1)))
          case "--watermark-max-age-days" =>
            a = a.copy(watermarkMaxAgeMs = (positive("--watermark-max-age-days", rest(i + 1).toDouble) * 24 * 3600 * 1000).toLong)
          case "--lock-ttl-minutes" =>
            a = a.copy(lockTtlMs = (positive("--lock-ttl-minutes", rest(i + 1).toDouble) * 60 * 1000).toLong)
          case "--orphan-gate-hours" =>
            a = a.copy(orphanGateMs = (positive("--orphan-gate-hours", rest(i + 1).toDouble) * 3600 * 1000).toLong)
          case "--min-snapshot-age-hours" => // 0 is legal here: it means count-only expiry, the default
            a = a.copy(minSnapshotAgeMs = (rest(i + 1).toDouble.max(0) * 3600 * 1000).toLong)
          case other => throw new IllegalArgumentException(s"unknown Maintain arg $other\n$usage")
        }
        i += 2
      }
      require(a.tiers.nonEmpty, s"--tiers is required in flag form\n$usage")
      a
    } else
      Args(
        args(0),
        tiers = Seq(rest(0)),
        maxFiles = if (rest.length > 1) rest(1).toInt else 8,
        keepSnapshots = if (rest.length > 2) rest(2).toInt else 3,
        ttlCutoff = if (rest.length > 3) Some(rest(3)) else None
      )
  }

  /** one maintenance cycle over a tier store (separated from `main` so specs
    * and embedding services can drive the full job against their own session).
    * `report` emits step JSON lines AS THEY COMPLETE (a killed run's output
    * shows exactly which steps landed); the summary rides the returned Report.
    */
  def run(
      spark: SparkSession,
      storeBase: String,
      tier: String,
      maxFiles: Int = 8,
      keepSnapshots: Int = 3,
      ttlCutoff: Option[String] = None,
      watermarkMaxAgeMs: Long = TableStore.DefaultWatermarkMaxAgeMs,
      report: String => Unit = _ => (),
      lockTtlMs: Long = TableStore.DefaultMaintenanceLockTtlMs,
      orphanGateMs: Long = TableStore.DefaultOrphanFileGateMs,
      // reader grace (Iceberg olderThan): snapshots younger than this are
      // kept beyond keepSnapshots so a long read job's resolved file set
      // survives fast streaming commit churn; 0 = count-only
      minSnapshotAgeMs: Long = 0L
  ): Report = {
    val store = new TableStore(storeBase, s"tier_$tier", lockTtlMs, orphanGateMs)
    val ttlSnap = ttlCutoff.map { cutoff =>
      val s = store.dropPartitionsOlderThan(spark, "day", cutoff, s"maintain-ttl-$cutoff")
      report(s"""{"step":"ttl","tier":"${Jobs.jsonStr(tier)}","cutoff":"${Jobs.jsonStr(cutoff)}","snapshot":${s.snapshotId},"partitions":${s.partitions.size}}""")
      s
    }
    val fragmented = store.currentSnapshot.toSeq
      .flatMap(_.partitions)
      .filter(_.files.size > maxFiles)
      .map(_.partition)
    var compacted = 0
    for (p <- fragmented) {
      // ConcurrentTableModification = expected concurrency outcome
      // (partition rewritten or dropped under us) — skip this cycle.
      // Anything else (IO errors, Spark faults — which can surface as
      // IllegalStateException too) fails the run loudly rather than being
      // swallowed into a successful-looking maintenance report.
      try { store.compactPartition(spark, "day", p); compacted += 1 }
      catch { case e: graft.store.ConcurrentTableModification => System.err.println(s"[maintain] skip $p: ${e.getMessage}") }
    }
    report(s"""{"step":"compact","tier":"${Jobs.jsonStr(tier)}","compacted":$compacted}""")
    // expireSnapshots already compacts the lineage ledger past its size gate
    // (a second unconditional pass would rewrite the whole file again for
    // nothing — sub-gate ledgers are bounded by the gate itself). Both ops
    // take the table's maintenance lease internally — a concurrent Maintain
    // surfaces as MaintenanceLockHeld, never as interleaved metadata writes;
    // the per-step lines above/below make a mid-cycle lock legible (the
    // steps that DID land are already reported).
    val reclaimed = store.expireSnapshots(keepLast = keepSnapshots, minSnapshotAgeMs = minSnapshotAgeMs)
    report(s"""{"step":"expire","tier":"${Jobs.jsonStr(tier)}","filesReclaimed":$reclaimed}""")
    val wmDeleted = store.gcStreamWatermarks(watermarkMaxAgeMs)
    report(s"""{"step":"watermark_gc","tier":"${Jobs.jsonStr(tier)}","watermarksGCed":$wmDeleted}""")
    Report(compacted, reclaimed, wmDeleted, ttlSnap.map(_.snapshotId), ttlSnap.map(_.partitions.size))
  }

  /** drive one cycle over EVERY requested tier. A tier whose maintenance
    * lease is held (another Maintain is live — cron + manual overlap) stops
    * at the locked step LOUDLY, not interleaved and not fatal to the
    * remaining tiers: the holder is doing the same job. Steps that already
    * completed on that tier keep their step lines (the lease is per
    * operation, so a concurrent run can alternate WHOLE operations with
    * this one — each op is individually atomic, and the "locked" line tells
    * the operator which cycle to re-run).
    */
  def runAll(spark: SparkSession, a: Args, report: String => Unit = println): Unit =
    for (tier <- a.tiers)
      try {
        val r = run(spark, a.storeBase, tier, a.maxFiles, a.keepSnapshots, a.ttlCutoff, a.watermarkMaxAgeMs, report,
          a.lockTtlMs, a.orphanGateMs, a.minSnapshotAgeMs)
        report(
          s"""{"step":"done","tier":"${Jobs.jsonStr(tier)}","compacted":${r.compacted},"filesReclaimed":${r.filesReclaimed},"watermarksGCed":${r.watermarksGCed}}"""
        )
      } catch {
        case e: graft.store.MaintenanceLockHeld =>
          report(s"""{"step":"locked","tier":"${Jobs.jsonStr(tier)}"}""")
          System.err.println(s"[maintain] $tier cycle stopped — lease held by another maintenance writer: ${e.getMessage}")
      }

  def main(args: Array[String]): Unit = {
    val parsed = parseArgs(args)
    val spark = Jobs.session("graft-maintain")
    spark.sparkContext.setLogLevel("WARN")
    runAll(spark, parsed)
    spark.stop()
  }
}

/** Detect: a tier store → validated outliers parquet (full 12-analyzer
  * exact pipeline per scope).
  *
  * Usage: DetectJob <storeBase> <tier> <outPath> [resolutionSeconds]
  */
object DetectJob {
  def main(args: Array[String]): Unit = {
    val storeBase = args(0)
    val tier = args(1)
    val outPath = args(2)
    val resolution = if (args.length > 3) args(3).toLong else 60L
    val spark = Jobs.session("graft-detect")
    spark.sparkContext.setLogLevel("WARN")
    val points = new TableStore(storeBase, s"tier_$tier")
      .read(spark)
      .where(col("metric").isin("regular", "error"))
      .select("scope", "metric", "bucket", "value")
    val validated = Detect.detectValidated(
      Detect.toPoints(points)(spark),
      EngineConfig(resolution = resolution)
    )
    validated.write.mode("overwrite").parquet(outPath)
    println(s"""{"job":"detect","out":"${Jobs.jsonStr(outPath)}","validated":${spark.read.parquet(outPath).count()}}""")
    spark.stop()
  }
}
