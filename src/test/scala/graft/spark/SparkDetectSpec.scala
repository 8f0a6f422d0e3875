package graft.spark

import graft.jobs.FixtureGen
import graft.kernel.{AnalyzerRegistry, OracleHarness, ScopePipeline}
import graft.model.EngineConfig
import graft.pipeline.Derive

/** End-to-end Spark path vs kernel path on the full fixture corpus:
  * fixture TSV → synthesized transcripts → Derive (distributed groupBy) →
  * Detect (flatMapGroups over scopes, 12 analyzers, scoring) must equal the
  * single-threaded kernel run bit-for-bit. Also asserts the per-turn
  * text-equality invariant under stable (conv_id, turn_idx) ordering.
  */
class SparkDetectSpec extends SparkTestBase {

  private def fixtureRows(fixture: String): Seq[(Long, Map[String, Double])] = {
    val raw = OracleHarness.parseTsv(fixture)
    val byTs = scala.collection.mutable.LinkedHashMap.empty[Long, Map[String, Double]]
    for ((metric, pts) <- raw.toSeq; p <- pts)
      byTs(p.ts) = byTs.getOrElse(p.ts, Map.empty) + (metric -> p.v)
    byTs.toSeq
  }

  // one representative from each fixture family (full corpus runs in the
  // kernel suite; Spark adds JVM overhead per fixture)
  private val fixtures = Seq(
    "constant_line_no_noise_flat_out.tsv",
    "constant_line_no_noise_with_gap.tsv",
    "constant_lines_no_noise_with_errors_in_error_rate.tsv",
    "steady_growth_no_noise_bump_up.tsv",
    "sine_no_noise_no_errors.tsv",
    "intervals_no_noise_with_errors.tsv",
    "real_test_2.tsv", // rollup=300 setting
    "real_test_4_peak.tsv",
    "real_test_5_long.tsv" // auto-rollup ladder 60→300→900→1800
  )

  for (fixture <- fixtures) {
    test(s"spark detect == kernel: $fixture") {
      val s = spark
      import s.implicits._
      val settings = OracleHarness.settings(fixture)
      val cfg = EngineConfig(resolution = settings.get("rollup").map(_.toLong).getOrElse(60L))

      val turns = FixtureGen.fromSeries(spark, fixture, fixtureRows(fixture))
      val derived = Derive.dropEmptySeries(Derive.deriveSeries(turns, cfg.resolution))
      val validated = Detect
        .detectValidated(Detect.toPoints(derived)(spark), cfg)
        .collect()
        .map(v => v.ts -> v.score)
        .toMap

      // kernel ground truth (raw TSV path)
      val raw = OracleHarness.parseTsv(fixture)
      val processed = ScopePipeline.process(raw.view.mapValues(_.toIterable).toMap, cfg)
      val flags = AnalyzerRegistry.all.flatMap(_.analyze(fixture, processed.series.values))
      val expected = ScopePipeline.score(flags, cfg.minScore)

      assert(validated.keySet == expected.keySet, "validated ts sets")
      for ((ts, score) <- expected)
        assert(validated(ts) == score, s"score at $ts") // bit-exact: same kernel inside
    }
  }

  test("per-turn text equality under stable (conv_id, turn_idx) ordering") {
    val turns = FixtureGen.fromSeries(spark, "fx", fixtureRows("real_test_1.tsv"))
    val roundTripped = turns
      .repartition(7)
      .orderBy("conv_id", "turn_idx")
      .collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"), r.getAs[String]("text")))
    roundTripped.foreach { case (conv, idx, text) =>
      val expected = FixtureGen.turnText(conv, idx)
      assert(text == expected || text == s"ERROR $expected", s"text mismatch at ($conv,$idx)")
    }
    assert(roundTripped.map(_._2).toSeq == roundTripped.indices.toSeq, "turn_idx dense & ordered")
  }

  for (fixture <- fixtures) {
    test(s"expected-errors check spark == kernel: $fixture") {
      val errFile = new java.io.File(s"${OracleHarness.fixtureDir}/$fixture.errors")
      if (errFile.isFile) {
        val rawExpected = "\\d+".r.findAllIn(scala.io.Source.fromFile(errFile).mkString).map(_.toLong).toSeq
        val settings = OracleHarness.settings(fixture)
        val cfg = EngineConfig(resolution = settings.get("rollup").map(_.toLong).getOrElse(60L))
        val turns = FixtureGen.fromSeries(spark, fixture, fixtureRows(fixture))
        val derived = Derive.dropEmptySeries(Derive.deriveSeries(turns, cfg.resolution))
        val mine = Detect
          .checkExpectedErrors(Detect.toPoints(derived)(spark), Map(fixture -> rawExpected), cfg)
          .collect()
          .map(c => (c.ts, c.matches, c.score, c.found))
          .sortBy(_._1)
          .toSeq

        val raw = OracleHarness.parseTsv(fixture)
        val processed = ScopePipeline.process(raw.view.mapValues(_.toIterable).toMap, cfg)
        val flags = AnalyzerRegistry.all.flatMap(_.analyze(fixture, processed.series.values))
        val kernel = ScopePipeline.expectedReport(flags, rawExpected, processed.resolution).sortBy(_._1)

        assert(mine == kernel, "spark expected-errors report == kernel")
        assert(mine.nonEmpty && mine.forall(_._4), "corpus contract: all expected errors found")
      }
    }
  }

  test("validated details carry all-outlier records + last-10 snapshots") {
    val cfg = EngineConfig()
    val turns = FixtureGen.fromSeries(spark, "fx", fixtureRows("real_test_4_peak.tsv"))
    val derived = Derive.dropEmptySeries(Derive.deriveSeries(turns, cfg.resolution))
    val validated = Detect.detectValidated(Detect.toPoints(derived)(spark), cfg).collect()
    assert(validated.nonEmpty)
    for (v <- validated) {
      assert(v.details.contains("\"outliers\":[{\"serie_name\""), v.details.take(200))
      assert(v.details.contains("\"timeseries\":{"), v.details.take(200))
      assert(v.details.contains("\"outlier_magnitude\":"))
      // every series snapshot is a ≤10-element numeric array
      val snapBlob = v.details.substring(v.details.indexOf("\"timeseries\":"))
      val arr = "\\[([^\\]]*)\\]".r.findAllMatchIn(snapBlob).map(_.group(1)).toSeq
      assert(arr.nonEmpty && arr.forall(_.split(",").length <= 10), snapBlob.take(200))
    }
    // the reference attaches the SAME full payload to every validated ts
    assert(validated.map(_.details).distinct.length == 1)
  }

  test("details JSON escapes quotes/control chars in user serie names") {
    val s = spark
    import s.implicits._
    // a metric name with a quote, backslash and newline — user data is not
    // guaranteed JSON-safe; the payload must stay parseable
    val evil = "reg\"ul\\ar\nx"
    val pts = (0 until 60).map { i =>
      Detect.SeriesPoint("sc", evil, 1000L + i * 60, if (i == 55) 1e6 else 100.0 + (i % 3))
    }
    val out = Detect.detectValidated(spark.createDataset(pts), EngineConfig(resolution = 60)).collect()
    assert(out.nonEmpty, "fixture must validate at least one ts")
    out.foreach { v =>
      // the raw name must NOT appear unescaped; the escaped form must parse
      assert(!v.details.contains("\"" + evil + "\""), v.details.take(200))
      assert(v.details.contains("reg\\\"ul\\\\ar\\nx"), v.details.take(300))
    }
  }

  test("detect is partitioning-invariant (1 vs 32 partitions)") {
    val s = spark
    import s.implicits._
    val cfg = EngineConfig()
    val turns = FixtureGen.fromSeries(spark, "fx", fixtureRows("real_test_4_flatout.tsv"))
    val derived = Derive.dropEmptySeries(Derive.deriveSeries(turns, cfg.resolution))
    val p1 = Detect
      .detectValidated(Detect.toPoints(derived.repartition(1))(spark), cfg)
      .collect()
      .map(v => v.ts -> v.score)
      .toMap
    val p32 = Detect
      .detectValidated(Detect.toPoints(derived.repartition(32))(spark), cfg)
      .collect()
      .map(v => v.ts -> v.score)
      .toMap
    assert(p1 == p32)
  }
}
