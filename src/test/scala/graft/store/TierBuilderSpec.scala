package graft.store

import graft.jobs.FixtureGen
import graft.spark.SparkTestBase
import org.apache.spark.sql.functions._

/** Store + resumability tests: manifests carry row counts and content
  * hashes; a kill-after-tier-k rebuild skips completed partitions and ends
  * content-identical to a clean one-shot build; TTL demotion drops old
  * partitions and re-manifests.
  */
class TierBuilderSpec extends SparkTestBase {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_store").toString

  private def corpus = FixtureGen.synthetic(spark, nConvs = 40, maxTurns = 4000, partitions = 4)

  test("tier build writes manifests with lineage and row counts") {
    val base = tmp()
    val snaps = TierBuilder.build(spark, corpus, base, inputSnapshot = "input-v1")
    assert(snaps.keySet == Set("raw", "1m", "1h", "1d"))
    for ((tier, snap) <- snaps) {
      assert(snap.inputSnapshot == "input-v1", tier)
      assert(snap.partitions.nonEmpty, tier)
      val store = new TableStore(base, s"tier_$tier")
      val rows = store.read(spark).count()
      assert(rows == snap.partitions.map(_.rows).sum, s"$tier manifest row count")
      // manifest json roundtrip
      assert(store.currentSnapshot.get == snap, tier)
    }
    // 1d tier must be a sum-preserving rollup of 1h
    val h = new TableStore(base, "tier_1h").read(spark).agg(sum("value")).head.getDouble(0)
    val d = new TableStore(base, "tier_1d").read(spark).agg(sum("value")).head.getDouble(0)
    assert(math.abs(h - d) < 1e-6)
  }

  test("kill-after-tier-k rebuild is content-identical and resumes") {
    val baseClean = tmp()
    val clean = TierBuilder.build(spark, corpus, baseClean, "input-v1")

    val baseKilled = tmp()
    val partial = TierBuilder.build(spark, corpus, baseKilled, "input-v1", failAfterTier = 2)
    assert(partial.keySet == Set("raw", "1m"))
    val resumed = TierBuilder.build(spark, corpus, baseKilled, "input-v1")

    for (tier <- Seq("raw", "1m", "1h", "1d")) {
      val a = clean(tier).partitions.map(p => (p.partition, p.rows, p.contentHash))
      val b = resumed(tier).partitions.map(p => (p.partition, p.rows, p.contentHash))
      assert(a == b, s"tier $tier content")
    }
    // resume wrote a SECOND snapshot for raw (id advanced), same content
    val rawStore = new TableStore(baseKilled, "tier_raw")
    assert(rawStore.snapshots.size == 2)
    assert(rawStore.snapshots.head.partitions == rawStore.snapshots.last.partitions)
  }

  test("TTL demotion drops old partitions and re-manifests") {
    val base = tmp()
    TierBuilder.build(spark, corpus, base, "input-v1")
    val store = new TableStore(base, "tier_raw")
    val days = store.currentSnapshot.get.partitions.map(_.partition).sorted
    assert(days.size > 1)
    val cutoff = days(1) // drop the oldest day
    val snap = store.dropPartitionsOlderThan(spark, "day", cutoff, "ttl-demotion")
    assert(snap.partitions.map(_.partition).min == cutoff)
    // partition col is inferred back as DATE — compare as string
    assert(store.read(spark).agg(min(col("day").cast("string"))).head.getString(0) == cutoff)
  }

  test("salted aggregation equals plain aggregation") {
    val df = corpus.groupBy("conv_id").count().withColumnRenamed("count", "v")
    val plain = df.groupBy(lit(1).as("k")).agg(sum("v").as("v")).head.getLong(1)
    val salted = SaltedAgg
      .sumSalted(df.withColumn("k", lit(1)), Seq("k"), "v", 16)
      .head.getLong(1)
    assert(plain == salted)
  }
}
