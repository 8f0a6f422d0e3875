package graft.store

import graft.jobs.FixtureGen
import graft.pipeline.{Derive, SeriesOps}
import graft.spark.SparkTestBase
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/** Seeded randomized differential for TierBuilder RESUME: each seed builds a
  * random transcripts corpus (sizes, day spread, and — on most seeds — a few
  * null-ts rows that flow into the __HIVE_DEFAULT_PARTITION__ null-day
  * partition, the resume hole fixed after round 4), kills a build at a
  * seeded random point — j complete tiers plus a seeded random PROPER
  * subset of the next tier's day partitions committed under the same input
  * snapshot (exactly the on-disk state a partition-wise writer leaves when
  * killed mid-tier) — then resumes with a plain `TierBuilder.build` and
  * demands the result be manifest-identical (partition, rows, contentHash)
  * to a clean one-shot build of the same corpus. Complements the curated
  * kill-after-tier-k test in [[TierBuilderSpec]] the way the other
  * randomized soaks complement their fixture suites.
  */
class TierBuilderResumeRandomSpec extends SparkTestBase {

  /** sweep width: 5 by default (CI wall-clock — each seed runs two full tier
    * builds); widen locally with `sbt 'set Test/javaOptions +=
    * "-Dgraft.randFixtures=30"; testOnly graft.store.TierBuilderResumeRandomSpec'`
    * — every scenario is deterministic per seed, so a wide run reproduces
    */
  private val N = sys.props.getOrElse("graft.randFixtures", "5").toInt

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_resume_rand").toString

  private val NullKey = ExternalCatalogUtils.DEFAULT_PARTITION_NAME

  for (seed <- 0 until N) {
    test(s"seed $seed: kill-after-partition-k resume is manifest-identical to a clean build") {
      val rnd = new scala.util.Random(0x713b5 + seed * 7919)
      val in = s"input-rr$seed"

      // random corpus: sizes vary, and 2 of 3 seeds add null-ts rows so the
      // null-day partition exercises the resume keyspace normalization
      val nConvs = 6 + rnd.nextInt(10)
      val maxTurns = 1500 + rnd.nextInt(2500)
      val base = FixtureGen.synthetic(spark, nConvs, maxTurns, partitions = 2)
      val corpus =
        if (rnd.nextInt(3) == 0) base
        else {
          val s = spark
          import s.implicits._
          val nulls = (0 until 1 + rnd.nextInt(4))
            .map(i => (s"conv_${rnd.nextInt(nConvs)}", 100000 + i, "user", s"null-ts row $i", Option.empty[String]))
            .toDF("conv_id", "turn_idx", "role", "text", "tool")
            .withColumn("ts", lit(null).cast("timestamp"))
          base.unionByName(nulls)
        }

      val baseClean = tmp()
      val clean = TierBuilder.build(spark, corpus, baseClean, in)

      // the kill point: j tiers fully committed, then a seeded random PROPER
      // subset of tier j's (0-indexed) day partitions committed — the state
      // a run killed between per-partition commits of tier j+1 leaves
      val baseKilled = tmp()
      val j = rnd.nextInt(4)
      if (j > 0) {
        val partial = TierBuilder.build(spark, corpus, baseKilled, in, failAfterTier = j)
        assert(partial.size == j, s"failAfterTier=$j must complete exactly $j tiers, got ${partial.keySet}")
      }
      val tiers = TierBuilder.TierResolutions
      val (tierName, res) = tiers(j)
      val tierDf =
        if (j == 0) TierBuilder.withDay(Derive.deriveSeries(corpus, 60L, extraMetrics = true))
        else
          TierBuilder.withDay(
            SeriesOps.bucketSum(new TableStore(baseKilled, s"tier_${tiers(j - 1)._1}").read(spark).drop("day"), res)
          )
      val days = tierDf
        .select(col("day").cast("string"))
        .distinct()
        .collect()
        .map(r => Option(r.getString(0)).getOrElse(NullKey))
        .toSeq
        .sorted
      val committed = rnd.shuffle(days).take(rnd.nextInt(days.size)).toSet // proper subset, possibly empty
      if (committed.nonEmpty)
        new TableStore(baseKilled, s"tier_$tierName").write(tierDf, "day", in, onlyPartitions = Some(committed))

      val resumed = TierBuilder.build(spark, corpus, baseKilled, in)

      for ((tier, _) <- tiers) {
        val a = clean(tier).partitions.map(p => (p.partition, p.rows, p.contentHash))
        val b = resumed(tier).partitions.map(p => (p.partition, p.rows, p.contentHash))
        assert(a == b, s"seed $seed tier $tier (kill point: $j full tiers + ${committed.size}/${days.size} " +
          s"partitions of $tierName): resumed manifests diverge from clean\nclean  =$a\nresumed=$b")
      }
      // null-day coverage when present: the clean build must carry it AND
      // the resume must not have lost it (the pre-fix failure mode)
      if (corpus.where(col("ts").isNull).limit(1).count() > 0)
        assert(resumed("raw").partitions.exists(_.partition == NullKey),
          s"seed $seed: null-day partition missing after resume")
      // fully-completed tiers gain NO redundant snapshot on resume
      for (idx <- 0 until j)
        assert(new TableStore(baseKilled, s"tier_${tiers(idx)._1}").snapshots.size == 1,
          s"seed $seed: completed tier ${tiers(idx)._1} churned a no-op snapshot on resume")
      // the partially-committed tier resumed by writing ONLY the missing
      // partitions: its partial commit and its resume commit both survive
      if (committed.nonEmpty && committed.size < days.size)
        assert(new TableStore(baseKilled, s"tier_$tierName").snapshots.size == 2,
          s"seed $seed: partial tier $tierName should hold exactly its kill + resume commits")
    }
  }
}
