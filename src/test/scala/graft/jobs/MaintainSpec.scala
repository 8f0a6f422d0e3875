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

  test("parseArgs: flag form, legacy positional form, bad flags rejected") {
    val f = Maintain.parseArgs(Array("/s", "--tiers", "raw,1h,1d", "--max-files", "4",
      "--keep-snapshots", "2", "--ttl-cutoff", "2024-01-01", "--watermark-max-age-days", "14"))
    assert(f == Maintain.Args("/s", Seq("raw", "1h", "1d"), 4, 2, Some("2024-01-01"), 14L * 24 * 3600 * 1000))
    // fractional days work (operators tuning the guard below a day)
    assert(Maintain.parseArgs(Array("/s", "--tiers", "raw", "--watermark-max-age-days", "0.5")).watermarkMaxAgeMs
      == 12L * 3600 * 1000)
    val legacy = Maintain.parseArgs(Array("/s", "raw", "4", "1", "2024-01-01"))
    assert(legacy == Maintain.Args("/s", Seq("raw"), 4, 1, Some("2024-01-01")))
    assert(Maintain.parseArgs(Array("/s", "1h")) == Maintain.Args("/s", Seq("1h")))
    intercept[IllegalArgumentException](Maintain.parseArgs(Array("/s", "--tiers", "raw", "--bogus", "1")))
    intercept[IllegalArgumentException](Maintain.parseArgs(Array("/s", "--tiers")))
    intercept[IllegalArgumentException](Maintain.parseArgs(Array("/s", "--max-files", "4")))
    // a forgotten storeBase must error, not silently maintain a store named "--tiers"
    intercept[IllegalArgumentException](Maintain.parseArgs(Array("--tiers", "raw")))
    // store lease/orphan tunables reach the Args (and from there the TableStore ctor)
    val tuned = Maintain.parseArgs(Array("/s", "--tiers", "raw", "--lock-ttl-minutes", "90", "--orphan-gate-hours", "48"))
    assert(tuned.lockTtlMs == 90L * 60 * 1000 && tuned.orphanGateMs == 48L * 3600 * 1000)
    // zero/negative/NaN durations DISABLE the safety mechanisms — parse must reject them
    for (bad <- Seq("0", "-1", "NaN"))
      intercept[IllegalArgumentException](Maintain.parseArgs(Array("/s", "--tiers", "raw", "--orphan-gate-hours", bad)))
    intercept[IllegalArgumentException](Maintain.parseArgs(Array("/s", "--tiers", "raw", "--lock-ttl-minutes", "0")))
    intercept[IllegalArgumentException](Maintain.parseArgs(Array("/s", "--tiers", "raw", "--max-files", "0")))
  }

  test("runAll: one invocation maintains every tier; a leased tier is skipped loudly, not interleaved") {
    val base = Files.createTempDirectory("graft_maint_mt").toString
    for (tier <- Seq("raw", "1h", "1d")) {
      val store = new TableStore(base, s"tier_$tier")
      for (i <- 0 until 6)
        store.write(df("2024-03-01" -> 1), "day", s"stream-$tier-batch-$i", append = true)
    }
    // hold 1h's lease, as a concurrent Maintain in another process would
    val lock = Paths.get(s"$base/tier_1h/_manifests/maintenance.lock")
    Files.writeString(lock, "pid=9 op=expireSnapshots nonce=other")
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    Maintain.runAll(spark,
      Maintain.Args(base, Seq("raw", "1h", "1d"), maxFiles = 2, keepSnapshots = 1), lines += _)
    assert(lines.count(_.contains("\"step\":\"done\"")) == 2, s"raw+1d must complete: $lines")
    assert(lines.exists(l => l.contains("\"step\":\"locked\"") && l.contains("\"1h\"")),
      s"leased tier must surface as locked: $lines")
    for (tier <- Seq("raw", "1d")) {
      val store = new TableStore(base, s"tier_$tier")
      assert(store.snapshots.size == 1, s"$tier not expired")
      for (i <- 0 until 6) assert(store.hasCommit(s"stream-$tier-batch-$i"), s"$tier lost batch $i lineage")
    }
    // the leased tier's compaction MAY land (it is snapshot-CAS + validation
    // protected, not lease-protected), but the lease-guarded steps must not:
    // nothing expired, every lineage id still live in manifests
    val leased = new TableStore(base, "tier_1h")
    assert(leased.snapshots.size >= 6, "leased tier must not be expired")
    for (i <- 0 until 6) assert(leased.hasCommit(s"stream-1h-batch-$i"), s"1h lost batch $i lineage")
    Files.delete(lock)
    // next cycle picks the skipped tier up
    val out2 = scala.collection.mutable.ArrayBuffer.empty[String]
    Maintain.runAll(spark, Maintain.Args(base, Seq("1h"), maxFiles = 2, keepSnapshots = 1), out2 += _)
    assert(out2.exists(_.contains("\"step\":\"done\"")) && new TableStore(base, "tier_1h").snapshots.size == 1)
  }

  test("lease/orphan tunables flow through run() to the store") {
    val base = Files.createTempDirectory("graft_maint_tune").toString
    val store = new TableStore(base, "tier_raw")
    store.write(df("2024-03-01" -> 2), "day", "in-v1")
    store.write(df("2024-03-01" -> 1), "day", "in-v2", onlyPartitions = Some(Set("2024-03-01")))
    // orphan gate 0: a FRESH unreferenced file is treated as an aged orphan
    // and reclaimed in the same cycle — proves the flag reaches expiry
    val inflight = Paths.get(s"$base/tier_raw/data/day=2024-03-01/s000000099-inflight.parquet")
    Files.writeString(inflight, "x")
    // backdate a few seconds: gate 0 compares mtime against "now" captured
    // inside expiry, and a same-millisecond tie would flakily keep the file
    Files.setLastModifiedTime(inflight,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000L))
    Maintain.run(spark, base, "raw", keepSnapshots = 1, orphanGateMs = 0L)
    assert(!Files.exists(inflight), "orphan-gate override must reach the store")
    // lock TTL 0: a just-written foreign lease is immediately stealable —
    // proves the flag reaches the lease
    val lock = Paths.get(s"$base/tier_raw/_manifests/maintenance.lock")
    Files.writeString(lock, "pid=9 op=x nonce=other")
    val r = Maintain.run(spark, base, "raw", keepSnapshots = 1, lockTtlMs = 0L)
    // already expired to 1 snapshot above, so THIS cycle reclaims nothing —
    // the point is that it RAN (stole the fresh lease) instead of throwing
    assert(r.filesReclaimed == 0 && !Files.exists(lock), "lock-ttl override must reach the lease")
  }

  test("watermark max-age is settable: a 2-day-old dead watermark survives 7d, dies at 1d") {
    val base = Files.createTempDirectory("graft_maint_wm").toString
    val store = new TableStore(base, "tier_raw")
    store.write(df("2024-03-01" -> 1), "day", "in-v1")
    store.setStreamWatermark("slow-stream", 3L)
    val mdir = Paths.get(s"$base/tier_raw/_manifests")
    val aged = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 2L * 24 * 3600 * 1000)
    val wms = Files.list(mdir)
    try wms.iterator().asScala.filter(_.getFileName.toString.startsWith("watermark-")).foreach(Files.setLastModifiedTime(_, aged))
    finally wms.close()
    // default guard (7d): an infrequent stream's watermark must survive
    val r7 = Maintain.run(spark, base, "raw")
    assert(r7.watermarksGCed == 0 && store.streamWatermark("slow-stream").contains(3L),
      s"2-day-old watermark must survive the default 7d guard: $r7")
    // tightened guard (1d) collects it
    val r1 = Maintain.run(spark, base, "raw", watermarkMaxAgeMs = 24L * 3600 * 1000)
    assert(r1.watermarksGCed == 1 && store.streamWatermark("slow-stream").isEmpty,
      s"1d guard must collect the 2-day-old watermark: $r1")
  }

  test("step-report lines stay well-formed JSON for hostile tier/cutoff values") {
    // unit contract of the escaper itself
    assert(Jobs.jsonStr("raw") == "raw")
    assert(Jobs.jsonStr("""a"b\c""") == """a\"b\\c""")
    assert(Jobs.jsonStr("a\nb\tc") == "a\\u000ab\\u0009c")

    // end-to-end: a tier carrying a quote (legal in a linux directory name;
    // backslash is covered by the unit pins above — hadoop's path glob
    // treats it as an escape, so it can't name a store tier at all) plus a
    // hostile cutoff must emit parseable step lines — runAll/cron consume
    // this channel, so one bad value must not corrupt it
    val base = Files.createTempDirectory("graft_maint_json").toString
    val tier = """we"ird tier"""
    new TableStore(base, s"tier_$tier").write(df("2024-03-01" -> 2), "day", "in-1")
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    Maintain.run(spark, base, tier, ttlCutoff = Some("2023-01-01\"x"), report = lines += _)
    assert(lines.nonEmpty, "expected step-report lines")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper
    for (line <- lines) {
      val node = mapper.readTree(line) // throws on malformed JSON
      assert(node.get("tier").asText() == tier, s"tier must round-trip through the escape: $line")
    }
    assert(lines.exists(l => mapper.readTree(l).path("cutoff").asText() == "2023-01-01\"x"),
      s"cutoff must round-trip: $lines")
  }
}
