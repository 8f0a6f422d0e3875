package graft.jobs

import graft.spark.SparkTestBase
import graft.store.TableStore
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** End-to-end drive of the Maintain job surface (the nightly companion of
  * streaming ingestion): TTL demotion, fragmentation compaction, snapshot
  * expiry with physical file reclaim, replay-guard metadata bounds — one
  * `Maintain.run` invocation over a store built the way production builds
  * it (batch writes + streaming appends).
  */
class MaintainSpec extends SparkTestBase {

  private def df(days: (String, Int)*) = {
    import spark.implicits._
    days.flatMap { case (d, n) => (0 until n).map(i => (d, i.toLong, i * 1.5)) }
      .toDF("day", "seq", "value")
  }

  test("Maintain.run: ttl + compaction + expiry + watermark GC in one cycle") {
    val base = Files.createTempDirectory("graft_maint").toString
    val store = new TableStore(base, "tier_raw")

    // fragment one partition with appends (one file per append, like
    // per-micro-batch streaming commits), plus an old partition to TTL away
    store.write(df("2023-01-01" -> 4), "day", "in-old")
    for (i <- 0 until 10)
      store.write(df("2024-03-01" -> 2), "day", s"frag-$i", append = true, onlyPartitions = Some(Set("2024-03-01")))
    val preFiles = store.currentSnapshot.get.partitions.find(_.partition == "2024-03-01").get.files.size
    assert(preFiles >= 10, s"expected fragmentation, got $preFiles files")

    // a dead stream's ancient watermark (no manifest references it)
    store.setStreamWatermark("dead-gen", 5L)
    val mdir = Paths.get(s"$base/tier_raw/_manifests")
    val wms = Files.list(mdir)
    val aged = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 8L * 24 * 3600 * 1000L)
    try wms.iterator().asScala.filter(_.getFileName.toString.startsWith("watermark-")).foreach(Files.setLastModifiedTime(_, aged))
    finally wms.close()

    val report = Maintain.run(spark, base, "raw", maxFiles = 4, keepSnapshots = 1, ttlCutoff = Some("2024-01-01"))

    assert(report.compacted == 1, s"fragmented partition must compact: $report")
    assert(report.filesReclaimed > 0, "expiry must reclaim the pre-compaction files")
    assert(report.watermarksGCed == 1, "dead stream watermark must be collected")
    // table state after the cycle: TTL'd partition gone, compacted partition
    // intact (20 appended rows), exactly keepSnapshots manifests remain
    val rows = store.read(spark).groupBy(org.apache.spark.sql.functions.col("day").cast("string")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("2024-03-01" -> 20L), s"got $rows")
    assert(store.currentSnapshot.get.partitions.map(_.files.size).sum == 1, "one file after compaction")
    val names = {
      val s = Files.list(mdir)
      try s.iterator().asScala.map(_.getFileName.toString).toVector finally s.close()
    }
    assert(names.count(_.startsWith("snapshot-")) == 1, s"snapshots not expired: $names")
    // the TTL'd partition's data files are physically gone
    val oldDir = Paths.get(s"$base/tier_raw/data/2023-01-01")
    assert(!Files.isDirectory(oldDir) || { val s = Files.list(oldDir); try !s.iterator().hasNext finally s.close() },
      "TTL'd partition files must be reclaimed by expiry")
    // a second cycle is a no-op (idempotent maintenance)
    val again = Maintain.run(spark, base, "raw", maxFiles = 4, keepSnapshots = 1, ttlCutoff = Some("2024-01-01"))
    assert(again.compacted == 0 && again.watermarksGCed == 0, s"second cycle must be a no-op: $again")
  }
}
