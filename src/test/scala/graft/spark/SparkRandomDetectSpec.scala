package graft.spark

import graft.kernel.{AnalyzerRegistry, OracleHarness, RandomFixtures, ScopePipeline}
import graft.model.EngineConfig

/** Seeded randomized differential for the SPARK path: the same generated
  * fixtures [[graft.kernel.KernelRandomDifferentialSpec]] pins against the
  * reference jar are fed through `Detect.detectValidated` (distributed
  * scope-clustered mapPartitions) and must match the single-threaded kernel
  * run bit-for-bit — same contract as [[SparkDetectSpec]], swept across
  * input shapes the curated corpus doesn't cover (gap-heavy ladder entry,
  * log-normalized spikes, dup-bucket error_rate). The raw points come from
  * `OracleHarness.parseTsvAt` (exact-dup-ts last-wins already applied), so
  * both sides see the identical raw map; within-bucket sum order differs
  * (file order vs bucket-sorted) but the dyadic fixture values make every
  * sum exact in any order (see [[graft.kernel.RandomFixtures]]).
  */
class SparkRandomDetectSpec extends SparkTestBase {

  /** sweep width (same -Dgraft.randFixtures knob as the kernel sweep) */
  private val N = sys.props.getOrElse("graft.randFixtures", "10").toInt

  private def kernelScores(i: Int, raw: Map[String, Seq[graft.kernel.Pt]], cfg: EngineConfig): Map[Long, Double] = {
    val processed = ScopePipeline.process(raw.view.mapValues(_.toIterable).toMap, cfg)
    val flags = AnalyzerRegistry.all.flatMap(_.analyze(s"kr_$i", processed.series.values))
    ScopePipeline.score(flags, cfg.minScore)
  }

  private def points(i: Int, raw: Map[String, Seq[graft.kernel.Pt]]): Seq[Detect.SeriesPoint] =
    raw.toSeq.flatMap { case (metric, ps) =>
      ps.map(p => Detect.SeriesPoint(s"kr_$i", metric, p.ts, p.v))
    }

  for (i <- 0 until N) {
    test(s"random fixture $i: spark detectValidated == kernel (bit-exact scores)") {
      val s = spark
      import s.implicits._
      val path = RandomFixtures.path(i)
      val raw = OracleHarness.parseTsvAt(path)
      val settings = OracleHarness.settingsAt(path)
      // fromSettings, not a hand-rolled rollup lookup: it already maps every
      // sidecar key the reference honors, so generator extensions can't
      // silently diverge the two configs
      val cfg = EngineConfig.fromSettings(settings)

      val validated = Detect
        .detectValidated(s.createDataset(points(i, raw)).repartition(8), cfg)
        .collect()
      assert(validated.forall(_.scope == s"kr_$i"))
      val mine = validated.map(v => v.ts -> v.score).toMap
      val expected = kernelScores(i, raw, cfg)
      assert(mine.keySet == expected.keySet, "validated ts sets")
      for ((ts, score) <- expected)
        assert(mine(ts) == score, s"score at $ts") // bit-exact: same kernel inside
    }
  }

  test("multi-scope pass: all default-resolution random fixtures in ONE detect run") {
    val s = spark
    import s.implicits._
    val cfg = EngineConfig()
    // only fixtures whose .settings resolve to the default config can share
    // one cfg (inert-key-only sidecars qualify — see RandomFixtures)
    val eligible =
      (0 until N).filter(i => EngineConfig.fromSettings(OracleHarness.settingsAt(RandomFixtures.path(i))) == cfg)
    assert(eligible.size >= 3, s"sweep needs several settings-free fixtures, got $eligible")
    val raws = eligible.map(i => i -> OracleHarness.parseTsvAt(RandomFixtures.path(i))).toMap

    val all = eligible.flatMap(i => points(i, raws(i)))
    // random partition placement: scopeRuns must re-cluster across scopes
    val validated = Detect
      .detectValidated(s.createDataset(all).repartition(16), cfg)
      .collect()
      .groupBy(_.scope)
      .view
      .mapValues(_.map(v => v.ts -> v.score).toMap)
      .toMap

    for (i <- eligible) {
      val expected = kernelScores(i, raws(i), cfg)
      val mine = validated.getOrElse(s"kr_$i", Map.empty[Long, Double])
      assert(mine.keySet == expected.keySet, s"fixture $i validated ts sets")
      for ((ts, score) <- expected) assert(mine(ts) == score, s"fixture $i score at $ts")
    }
    assert(validated.keySet.subsetOf(eligible.map(i => s"kr_$i").toSet), "no phantom scopes")
  }
}
