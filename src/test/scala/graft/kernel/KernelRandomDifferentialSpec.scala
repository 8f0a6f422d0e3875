package graft.kernel

import graft.model.EngineConfig
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized differential for the FULL kernel pipeline: generated
  * fixtures (random walk values with spikes, gaps, same-bucket duplicate
  * rows, exact-duplicate timestamps, optional error series, optional
  * `.settings` rollup overrides, and magnitudes spanning 1× to 1e6× so the
  * auto-log-normalize path triggers on some seeds) are run through BOTH the
  * reference jar's `AbstractDataLoader.load()` and
  * [[ScopePipeline.process]], then through every paired analyzer. Processed
  * points, train stats, and every analyzer flag must match EXACTLY (double
  * bit patterns) — the same contract [[KernelVsReferenceSpec]] pins on the
  * 23 curated fixtures, swept here across input shapes the corpus doesn't
  * cover (e.g. the 60→300→900 ladder entered from a gap-heavy series, spike
  * sanitation on log-normalized data, error_rate derivation under dup
  * buckets). Fixture shapes and the dyadic-value rationale live in
  * [[RandomFixtures]].
  */
class KernelRandomDifferentialSpec extends AnyFunSuite {

  /** sweep width: 10 by default (CI wall-clock), widen locally with
    * `sbt 'set Test/javaOptions += "-Dgraft.randFixtures=40"; testOnly
    * graft.kernel.KernelRandomDifferentialSpec'` to shake out rare seeds —
    * every fixture is deterministic per index, so a wide run reproduces
    */
  private val N = sys.props.getOrElse("graft.randFixtures", "10").toInt

  private def fixture(i: Int): String = RandomFixtures.path(i)

  /** One kernel run per fixture — parse, process, every analyzer — shared by
    * the three per-fixture tests below (each stays self-sufficient under
    * test filtering: whichever runs first computes it). Config comes from
    * `EngineConfig.fromSettings`, not a hand-rolled rollup lookup: it
    * already maps every sidecar key the reference honors, so generator
    * extensions can't silently diverge the two configs.
    */
  private val kernelMemo = scala.collection.mutable.Map
    .empty[Int, (ScopePipeline.Processed, Seq[(String, Seq[graft.model.Flag])])]
  private def kernelRun(i: Int): (ScopePipeline.Processed, Seq[(String, Seq[graft.model.Flag])]) =
    kernelMemo.synchronized {
      kernelMemo.getOrElseUpdate(
        i, {
          val path = fixture(i)
          val raw = OracleHarness.parseTsvAt(path)
          val cfg = EngineConfig.fromSettings(OracleHarness.settingsAt(path))
          val processed = ScopePipeline.process(raw.view.mapValues(_.toIterable).toMap, cfg)
          val perAnalyzer = OracleHarness.analyzerPairs.map { case (a, _) =>
            a.name -> a.analyze(s"kr_$i", processed.series.values)
          }
          (processed, perAnalyzer)
        }
      )
    }
  private def allFlags(i: Int): Seq[graft.model.Flag] = kernelRun(i)._2.flatMap(_._2)

  for (i <- 0 until N) {
    test(s"random fixture $i: processed series, train stats, and all analyzer flags match the reference") {
      val path = fixture(i)
      val oracle = OracleHarness.loadPath(path)
      val (mine, perAnalyzer) = kernelRun(i)

      assert(mine.resolution == oracle.resolution, "final resolution")
      assert(mine.series.keySet == oracle.series.keySet, "series names")
      for ((name, ks) <- mine.series) {
        val ref = oracle.series(name)
        val refData = {
          import scala.jdk.CollectionConverters._
          ref.getData.entrySet().iterator().asScala
            .map(e => Pt(e.getKey.longValue(), e.getValue.doubleValue())).toSeq
        }
        assert(ks.data.toSeq == refData, s"series $name points")
        assert(ks.stats.avg == ref.getTrainAvg, s"series $name trainAvg")
        assert(ks.stats.stdDev == ref.getTrainStdDev, s"series $name trainStdDev")
        assert(ks.stats.minVal == ref.getTrainMinVal, s"series $name trainMin")
        assert(ks.stats.maxVal == ref.getTrainMaxVal, s"series $name trainMax")
      }

      val mineByName = perAnalyzer.toMap
      for ((mineA, refA) <- OracleHarness.analyzerPairs) {
        val refFlags = OracleHarness.analyze(oracle, refA(), mineA.name, s"kr_$i")
        assert(
          OracleHarness.canonFlags(mineByName(mineA.name)) == OracleHarness.canonFlags(refFlags),
          s"analyzer ${mineA.name} flags"
        )
      }
    }

    test(s"random fixture $i: end-to-end validated outliers + scores match reference validate(1)") {
      val path = fixture(i)
      val dl = new nl.us2.timeseriesoutlierdetection.FileDataLoader(path)
      dl.load()
      val refList = new java.util.ArrayList[nl.us2.timeseriesoutlierdetection.ITimeserieAnalyzer]()
      OracleHarness.analyzerPairs.foreach { case (_, mk) => refList.add(mk()) }
      dl.analyze(refList) // serial overload
      import scala.jdk.CollectionConverters._
      val refValidated = dl.validate(1).asScala.map(v => v.getTs -> v.getScore).toMap

      val mine = ScopePipeline.score(allFlags(i), 1.0)

      assert(mine.keySet == refValidated.keySet, "validated outlier ts sets")
      for ((ts, score) <- mine) {
        val ref = refValidated(ts)
        // 1e-9 relative like GoldenSuiteSpec: score summation order differs
        assert(math.abs(score - ref) <= 1e-9 * math.max(1.0, math.abs(ref)), s"score at $ts: mine=$score ref=$ref")
      }
      validatedCounts(i) = refValidated.size
    }
  }

  for (i <- 0 until N) {
    test(s"random fixture $i: expected-errors rebucket + crash parity vs reference validate(1)") {
      val (processed, _) = kernelRun(i)
      val flags = allFlags(i)
      val outlierTs = flags.filter(_.isOutlier).map(_.ts)

      // sibling fixture with a generated .errors sidecar aimed using the
      // kernel's own outlier buckets (see RandomFixtures.errorsPath, which
      // also returns the raw picks it wrote — no sidecar re-parse here)
      val (path, rawExpected) = RandomFixtures.errorsPath(i, outlierTs, processed.resolution)
      val report = ScopePipeline.expectedReport(flags, rawExpected, processed.resolution)

      // O13 rebucket + dedupe parity (the reference rebuckets in load(),
      // `AbstractDataLoader.java:400-409`, preserving first-occurrence order)
      val run = OracleHarness.loadPath(path)
      assert(OracleHarness.expectedErrors(run) == report.map(_._1), "rebucket+dedupe order")

      // crash parity: reference validate() NPE-unboxes on the first expected
      // bucket with zero outlier records (`AbstractDataLoader.java:317-319`);
      // our report answers found=false there instead of crashing. When every
      // expected bucket IS found, validate(1) must succeed and agree on the
      // scores of the expected buckets it validates.
      val refList = new java.util.ArrayList[nl.us2.timeseriesoutlierdetection.ITimeserieAnalyzer]()
      OracleHarness.analyzerPairs.foreach { case (_, mk) => refList.add(mk()) }
      run.loader.analyze(refList)
      if (report.forall(_._4)) {
        import scala.jdk.CollectionConverters._
        val refValidated = run.loader.validate(1).asScala.map(v => v.getTs -> v.getScore).toMap
        for ((ts, _, score, _) <- report if score >= 1.0) {
          val ref = refValidated.get(ts)
          assert(
            ref.isDefined,
            s"kernel validates expected ts $ts (score $score) but reference validate(1) omits it"
          )
          assert(
            math.abs(ref.get - score) <= 1e-9 * math.max(1.0, math.abs(score)),
            s"score at expected ts $ts"
          )
        }
        errBranches(i) = "clean"
      } else {
        intercept[NullPointerException] { run.loader.validate(1) }
        errBranches(i) = "npe"
      }
    }
  }

  for (i <- 0 until N) {
    test(s"random fixture $i: validated details payload parity (outliers + last-10 snapshot)") {
      import scala.jdk.CollectionConverters._
      val dl = new nl.us2.timeseriesoutlierdetection.FileDataLoader(fixture(i))
      dl.load()
      val refList = new java.util.ArrayList[nl.us2.timeseriesoutlierdetection.ITimeserieAnalyzer]()
      OracleHarness.analyzerPairs.foreach { case (_, mk) => refList.add(mk()) }
      dl.analyze(refList)
      val refValidated = dl.validate(1).asScala
      detailsCompared(i) = refValidated.nonEmpty
      if (refValidated.nonEmpty) {
        // doubles compared via BIT PATTERNS like canonFlags (NaN-safe); the
        // flags-parity test above already pins both sides bit-exact, so the
        // details payload derived from them must round-trip identically
        def b(d: Double) = java.lang.Double.doubleToLongBits(d)
        val refDetails = refValidated.head.getDetails
        val refOutliers = refDetails
          .getAsJsonArray("outliers")
          .asScala
          .map(_.asInstanceOf[com.google.gson.JsonObject])
          .map { o =>
            (
              o.get("serie_name").getAsString,
              o.get("timestamp").getAsLong,
              o.get("analyzer_name").getAsString.stripSuffix("TimeserieAnalyzer"),
              b(o.get("measured_value").getAsString.toDouble),
              b(o.get("expected_value").getAsString.toDouble),
              b(o.get("expected_value_left_bound").getAsString.toDouble),
              b(o.get("expected_value_right_bound").getAsString.toDouble),
              b(o.get("outlier_magnitude").getAsString.toDouble)
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
              .map(v => b(v.getAsString.toDouble))
              .toSeq
          )
          .toMap

        val (processed, _) = kernelRun(i)
        val (mineOutliers, mineSnaps) = ScopePipeline.detailsPayload(allFlags(i), processed.series)
        val mineSet = mineOutliers
          .map(o =>
            (o.serieName, o.timestamp, o.analyzerName, b(o.measuredValue), b(o.expectedValue),
              b(o.leftBound), b(o.rightBound), b(o.magnitude))
          )
          .toSet
        assert(mineSet == refOutliers, "details outlier records")
        assert(
          mineSnaps.map { case (k, vs) => k -> vs.map(b) }.toMap == refSnaps,
          "last-10-point series snapshots"
        )
      }
    }
  }

  private val detailsCompared = scala.collection.mutable.Map.empty[Int, Boolean]
  private val errBranches = scala.collection.mutable.Map.empty[Int, String]
  private val validatedCounts = scala.collection.mutable.Map.empty[Int, Int]

  test("the details-parity sweep is non-vacuous: several fixtures compare a payload") {
    assume(detailsCompared.size == N, "needs the per-fixture runs")
    assert(detailsCompared.count(_._2) >= 3, s"payloads compared per fixture: $detailsCompared")
  }

  test("the expected-errors sweep exercises BOTH reference branches (clean validate and NPE)") {
    assume(errBranches.size == N, "needs the per-fixture runs")
    assert(errBranches.values.toSet == Set("clean", "npe"), s"branches per fixture: $errBranches")
  }

  test("the sweep covers reference-INERT settings keys in both spellings") {
    // forecast_periods (numeric — would shift the train/classify split if
    // wrongly honored — and non-numeric, which must never throw) plus an
    // unknown key: the reference's setConfig stores all of them unapplied
    // (`AbstractDataLoader.java:57-62`), and the per-fixture parity tests
    // above prove we do too. This pin keeps the generator honest.
    val settings = (0 until 10).map(i => OracleHarness.settingsAt(RandomFixtures.path(i)))
    val fp = settings.flatMap(_.get("forecast_periods"))
    assert(fp.exists(v => scala.util.Try(v.toLong).isSuccess), s"no numeric forecast_periods in sweep: $settings")
    assert(fp.exists(v => scala.util.Try(v.toLong).isFailure), s"no non-numeric forecast_periods in sweep: $settings")
    assert(settings.exists(_.contains("zz_unknown")), s"no unknown key in sweep: $settings")
  }

  test("the random sweep is non-vacuous: several fixtures produce validated outliers") {
    // registered after (and depends on) the per-fixture tests above; skip
    // rather than fail if the suite was filtered down to this test alone
    assume(validatedCounts.size == N, "needs the per-fixture runs")
    assert(validatedCounts.count(_._2 > 0) >= 3, s"validated counts per fixture: $validatedCounts")
  }
}
