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
        s"""{"tier":"$tier","snapshot":${s.snapshotId},"input":"${s.inputSnapshot}","partitions":${s.partitions.size},"rows":${s.partitions.map(_.rows).sum}}"""
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
  * Usage: Maintain <storeBase> <tier> [maxFiles=8] [keepSnapshots=3] [ttlCutoff]
  */
object Maintain {
  final case class Report(
      compacted: Int,
      filesReclaimed: Int,
      watermarksGCed: Int,
      ttlSnapshot: Option[Long] = None,
      ttlPartitions: Option[Int] = None
  )

  /** one maintenance cycle over a tier store (separated from `main` so specs
    * and embedding services can drive the full job against their own session;
    * all reporting rides the returned Report — `main` does the printing)
    */
  def run(
      spark: SparkSession,
      storeBase: String,
      tier: String,
      maxFiles: Int = 8,
      keepSnapshots: Int = 3,
      ttlCutoff: Option[String] = None
  ): Report = {
    val store = new TableStore(storeBase, s"tier_$tier")
    val ttlSnap = ttlCutoff.map(cutoff => store.dropPartitionsOlderThan(spark, "day", cutoff, s"maintain-ttl-$cutoff"))
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
    // expireSnapshots already compacts the lineage ledger past its size gate
    // (a second unconditional pass would rewrite the whole file again for
    // nothing — sub-gate ledgers are bounded by the gate itself). Watermark
    // GC is a single-maintenance-writer operation — this job is that writer.
    val reclaimed = store.expireSnapshots(keepLast = keepSnapshots)
    val wmDeleted = store.gcStreamWatermarks()
    Report(compacted, reclaimed, wmDeleted, ttlSnap.map(_.snapshotId), ttlSnap.map(_.partitions.size))
  }

  def main(args: Array[String]): Unit = {
    val storeBase = args(0)
    val tier = args(1)
    val maxFiles = if (args.length > 2) args(2).toInt else 8
    val keepSnapshots = if (args.length > 3) args(3).toInt else 3
    val ttlCutoff = if (args.length > 4) Some(args(4)) else None
    val spark = Jobs.session("graft-maintain")
    spark.sparkContext.setLogLevel("WARN")
    val r = run(spark, storeBase, tier, maxFiles, keepSnapshots, ttlCutoff)
    for ((cutoff, sid) <- ttlCutoff.zip(r.ttlSnapshot))
      println(s"""{"step":"ttl","cutoff":"$cutoff","snapshot":$sid,"partitions":${r.ttlPartitions.getOrElse(0)}}""")
    println(s"""{"step":"done","tier":"$tier","compacted":${r.compacted},"filesReclaimed":${r.filesReclaimed},"watermarksGCed":${r.watermarksGCed}}""")
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
    println(s"""{"job":"detect","out":"$outPath","validated":${spark.read.parquet(outPath).count()}}""")
    spark.stop()
  }
}
