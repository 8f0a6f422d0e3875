package graft.kernel

import graft.model.EngineConfig
import nl.us2.timeseriesoutlierdetection._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** End-to-end golden tests over the whole fixture corpus:
  *
  * 1. 11-analyzer validated-outlier parity: our pipeline+score vs the actual
  *    reference `load → analyze(serial) → validate(1)` (SVM excluded — no
  *    runnable jlibsvm offline, SURVEY §5.3). Set equality on ts; scores to
  *    1e-9 relative (summation order differs per SURVEY §5.2-Q6).
  * 2. Full 12-analyzer run (our SVM included) must flag every `.errors`
  *    timestamp — the corpus' de-facto contract.
  */
class GoldenSuiteSpec extends AnyFunSuite {

  private def referenceAnalyzers(): java.util.List[ITimeserieAnalyzer] = {
    val l = new java.util.ArrayList[ITimeserieAnalyzer]()
    l.add(new NoopTimeserieAnalyzer())
    l.add(new NormalDistributionTimeserieAnalyzer())
    l.add(new LogNormalDistributionTimeserieAnalyzer())
    l.add(new SimpleRegressionTimeserieAnalyzer())
    l.add(new MovingAverageTimeserieAnalyzer())
    l.add(new PolynomialRegressionTimeserieAnalyzer())
    l.add(new IntervalInterceptorTimeserieAnalyzer())
    l.add(new RandomWalkRegressionTimeserieAnalyzer())
    // OneClassSVM omitted: jlibsvm unavailable offline
    l.add(new TimeBucketSimpleRegressionTimeserieAnalyzer())
    l.add(new MultipleLinearRegressionTimeserieAnalyzer())
    l.add(new SimpleExponentialSmoothingTimeserieAnalyzer())
    l
  }

  private def kernelRun(fixture: String, analyzers: Seq[KAnalyzer]): Map[Long, Double] = {
    val raw = OracleHarness.parseTsv(fixture)
    val settings = OracleHarness.settings(fixture)
    val cfg = EngineConfig(resolution = settings.get("rollup").map(_.toLong).getOrElse(60L))
    val processed = ScopePipeline.process(raw.view.mapValues(_.toIterable).toMap, cfg)
    val flags = analyzers.flatMap(_.analyze(fixture, processed.series.values))
    ScopePipeline.score(flags, 1.0)
  }

  for (fixture <- OracleHarness.fixtureNames) {
    test(s"11-analyzer validated parity: $fixture") {
      val dl = new FileDataLoader(s"${OracleHarness.fixtureDir}/$fixture")
      dl.load()
      dl.analyze(referenceAnalyzers()) // serial overload
      val refValidated = dl.validate(1).asScala.map(v => v.getTs -> v.getScore).toMap

      val mine = kernelRun(fixture, AnalyzerRegistry.oracleSubset)
      assert(mine.keySet == refValidated.keySet, "validated outlier ts sets")
      for ((ts, score) <- mine) {
        val ref = refValidated(ts)
        assert(
          math.abs(score - ref) <= 1e-9 * math.max(1.0, math.abs(ref)),
          s"score at $ts: mine=$score ref=$ref"
        )
      }
    }

    test(s"validated details payload parity (outliers + last-10 snapshot): $fixture") {
      val dl = new FileDataLoader(s"${OracleHarness.fixtureDir}/$fixture")
      dl.load()
      dl.analyze(referenceAnalyzers())
      val refValidated = dl.validate(1).asScala
      if (refValidated.nonEmpty) {
        val refDetails = refValidated.head.getDetails
        val refOutliers = refDetails
          .getAsJsonArray("outliers")
          .asScala
          .map(_.asInstanceOf[com.google.gson.JsonObject])
          .map { o =>
            (
              o.get("serie_name").getAsString,
              o.get("timestamp").getAsLong,
              // kernel analyzers use the reference class name minus the
              // "TimeserieAnalyzer" suffix
              o.get("analyzer_name").getAsString.stripSuffix("TimeserieAnalyzer"),
              o.get("measured_value").getAsString.toDouble,
              o.get("expected_value").getAsString.toDouble,
              o.get("expected_value_left_bound").getAsString.toDouble,
              o.get("expected_value_right_bound").getAsString.toDouble,
              o.get("outlier_magnitude").getAsString.toDouble
            )
          }
          .toSet
        val refSnaps = refDetails
          .get("timeseries")
          .asInstanceOf[com.google.gson.JsonObject]
          .entrySet()
          .asScala
          .map(e =>
            e.getKey -> e.getValue
              .asInstanceOf[com.google.gson.JsonArray]
              .asScala
              .map(_.getAsString.toDouble)
              .toSeq
          )
          .toMap

        val raw = OracleHarness.parseTsv(fixture)
        val settings = OracleHarness.settings(fixture)
        val cfg = EngineConfig(resolution = settings.get("rollup").map(_.toLong).getOrElse(60L))
        val processed = ScopePipeline.process(raw.view.mapValues(_.toIterable).toMap, cfg)
        val flags = AnalyzerRegistry.oracleSubset.flatMap(_.analyze(fixture, processed.series.values))
        val (mineOutliers, mineSnaps) = ScopePipeline.detailsPayload(flags, processed.series)
        val mineSet = mineOutliers.map(o =>
          (o.serieName, o.timestamp, o.analyzerName, o.measuredValue, o.expectedValue,
            o.leftBound, o.rightBound, o.magnitude)
        ).toSet
        assert(mineSet == refOutliers, "details outlier records")
        assert(mineSnaps.toMap == refSnaps, "last-10-point series snapshots")
      }
    }

    test(s"expected-errors report (O13): $fixture") {
      val errFile = new java.io.File(s"${OracleHarness.fixtureDir}/$fixture.errors")
      if (errFile.isFile) {
        // RAW sidecar values (pre-rebucket) — the engine must reproduce the
        // reference's rebucket + dedupe (`AbstractDataLoader.java:402-410`)
        val rawExpected = {
          val txt = scala.io.Source.fromFile(errFile).mkString
          "\\d+".r.findAllIn(txt).map(_.toLong).toSeq
        }
        val run = OracleHarness.load(fixture)
        val refRebucketed = OracleHarness.expectedErrors(run)

        val raw = OracleHarness.parseTsv(fixture)
        val settings = OracleHarness.settings(fixture)
        val cfg = EngineConfig(resolution = settings.get("rollup").map(_.toLong).getOrElse(60L))
        val processed = ScopePipeline.process(raw.view.mapValues(_.toIterable).toMap, cfg)
        val flags = AnalyzerRegistry.all.flatMap(_.analyze(fixture, processed.series.values))
        val report = ScopePipeline.expectedReport(flags, rawExpected, processed.resolution)

        assert(report.map(_._1) == refRebucketed, "rebucket+dedupe order parity")
        // corpus contract: every expected error is found, with ≥1 outlier match
        for ((ts, matches, score, found) <- report) {
          assert(found && matches >= 1, s"expected error at $ts not found")
          assert(score == ScopePipeline.scoreAll(flags)(ts), s"score at $ts")
        }
      }
    }

    test(s".errors contract with full 12 analyzers: $fixture") {
      val oracle = OracleHarness.load(fixture)
      val expected = OracleHarness.expectedErrors(oracle).toSet
      if (expected.nonEmpty) {
        val mine = kernelRun(fixture, AnalyzerRegistry.all)
        assert(
          expected.subsetOf(mine.keySet),
          s"missing expected errors: ${expected -- mine.keySet}; flagged=${mine.keySet.toSeq.sorted}"
        )
      }
    }
  }
}
