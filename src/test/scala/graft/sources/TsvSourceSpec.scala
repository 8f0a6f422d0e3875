package graft.sources

import graft.kernel.OracleHarness
import graft.model.EngineConfig
import graft.spark.{Detect, SparkTestBase}

/** TSV source parity: the Spark TSV reader must reproduce the test
  * harness's reference-faithful parse on every fixture, and the full
  * TSV → Detect path must match the kernel.
  */
class TsvSourceSpec extends SparkTestBase {

  for (fixture <- Seq("real_test_4.tsv", "real_test_6.tsv", "constant_lines_no_noise_no_errors.tsv")) {
    test(s"tsv source parses like the reference: $fixture") {
      val path = s"${OracleHarness.fixtureDir}/$fixture"
      val mine = TsvSource
        .readSeries(spark, path)
        .collect()
        .map(r => (r.getAs[String]("metric"), r.getAs[Long]("bucket"), r.getAs[Double]("value")))
        .toSet
      val expected = OracleHarness
        .parseTsv(fixture)
        .flatMap { case (metric, pts) => pts.map(p => (metric, p.ts, p.v)) }
        .toSet
      assert(mine == expected)
    }
  }

  test("sidecar readers: .errors and .settings") {
    val base = s"${OracleHarness.fixtureDir}/real_test_2.tsv"
    assert(TsvSource.readSettings(spark, base) == Map("rollup" -> "300"))
    val errs = TsvSource.readExpectedErrors(spark, s"${OracleHarness.fixtureDir}/constant_line_no_noise_flat_out.tsv")
    assert(errs == Seq(1434880920L, 1434880980L, 1434881040L))
  }

  test("tsv → Detect end-to-end matches kernel validated set") {
    val s = spark
    val fixture = "real_test_4_flatout.tsv"
    val points = Detect.toPoints(TsvSource.readSeries(spark, s"${OracleHarness.fixtureDir}/$fixture"))(s)
    val validated = Detect
      .detectValidated(points, EngineConfig())
      .collect()
      .map(v => v.ts -> v.score)
      .toMap
    val raw = OracleHarness.parseTsv(fixture)
    val processed = graft.kernel.ScopePipeline.process(raw.view.mapValues(_.toIterable).toMap, EngineConfig())
    val flags = graft.kernel.AnalyzerRegistry.all.flatMap(_.analyze(fixture, processed.series.values))
    val expected = graft.kernel.ScopePipeline.score(flags, 1.0)
    assert(validated == expected)
  }
}
