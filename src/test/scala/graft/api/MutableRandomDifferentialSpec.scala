package graft.api

import graft.kernel.{AnalyzerRegistry, OracleHarness, RandomFixtures}
import nl.us2.timeseriesoutlierdetection.MutableDataLoader
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Seeded randomized differential for the PROGRAMMATIC source (S4): the same
  * generated fixtures as [[graft.kernel.KernelRandomDifferentialSpec]] are fed
  * entry-by-entry through the reference `MutableDataLoader` and
  * [[MutableSeriesSource]] via the raw STRING API, with seeded events the TSV
  * path can never produce — aliased ts spellings ("0"+ts / "+"+ts, distinct
  * raw-map keys whose parsed buckets collide and SUM), exact-spelling
  * re-puts (overwrite), and bulk-map adds (`addData(serie, HashMap)` putAll).
  * Processed points, final resolution, end-to-end `validate(1)`, and the
  * expected-error report (including the reference's NPE crash branch,
  * `AbstractDataLoader.java:317-319`) must agree.
  *
  * Injected alias values are dyadic (multiples of 0.25) for the same
  * order-independent-sum argument as [[RandomFixtures]]: the reference sums a
  * bucket in raw-map iteration order, we sum in ascending-ts order.
  */
class MutableRandomDifferentialSpec extends AnyFunSuite {

  /** sweep width (same knob as KernelRandomDifferentialSpec): default 10,
    * widen locally with -Dgraft.randFixtures=N in Test/javaOptions
    */
  private val N = sys.props.getOrElse("graft.randFixtures", "10").toInt

  /** (serie, tsSpelling, valueSpelling) calls in order; bulkAt marks one
    * contiguous range fed through the bulk-map overload on both sides (its
    * spellings are unique within the range, so putAll == sequential puts).
    */
  private def events(i: Int): (Seq[(String, String, String)], Range) = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(RandomFixtures.path(i))).asScala.toSeq
    val header = lines.head.split("\t")
    val rnd = new Random((4200L + i) * 0x9E3779B97F4A7C15L)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    for (l <- lines.tail) {
      val cols = l.split("\t")
      for (c <- 1 until header.length) {
        out += ((header(c), cols(0), cols(c)))
        // aliased spelling of the SAME numeric ts: a second raw-map entry
        // that bucket-SUMs with the original at load on both sides
        if (rnd.nextDouble() < 0.06) out += ((header(c), "0" + cols(0), "0.25"))
        if (rnd.nextDouble() < 0.03) out += ((header(c), "+" + cols(0), "1.5"))
        // exact-spelling re-put: HashMap.put overwrite, never a sum
        if (rnd.nextDouble() < 0.03) out += ((header(c), cols(0), "2.75"))
      }
    }
    // one contiguous bulk range with unique (serie, spelling) keys — scan
    // forward from a random start while keys stay fresh
    val start = rnd.nextInt(math.max(1, out.size / 2))
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    var end = start
    while (end < math.min(out.size, start + 40) && seen.add((out(end)._1, out(end)._2))) end += 1
    (out.toSeq, start until end)
  }

  private def feed(evs: Seq[(String, String, String)], bulk: Range)(
      single: (String, String, String) => Unit,
      bulkAdd: (String, Map[String, String]) => Unit
  ): Unit = {
    for (idx <- evs.indices) {
      if (idx == bulk.start && bulk.nonEmpty) {
        // keys are unique within the range, so per-serie map == put sequence
        evs.slice(bulk.start, bulk.end).groupBy(_._1).foreach { case (serie, es) =>
          bulkAdd(serie, es.map(e => e._2 -> e._3).toMap)
        }
      }
      if (!bulk.contains(idx)) single.tupled(evs(idx))
    }
  }

  private def refLoader(i: Int, evs: Seq[(String, String, String)], bulk: Range): MutableDataLoader = {
    val dl = new MutableDataLoader(s"mr_$i")
    OracleHarness.settingsAt(RandomFixtures.path(i)).foreach { case (k, v) => dl.setConfig(k, v) }
    feed(evs, bulk)(
      dl.addData(_, _, _),
      (serie, m) => {
        val jm = new java.util.HashMap[String, String]()
        m.foreach { case (k, v) => jm.put(k, v) }
        dl.addData(serie, jm)
      }
    )
    dl
  }

  private def mineLoader(i: Int, evs: Seq[(String, String, String)], bulk: Range): MutableSeriesSource = {
    val src = new MutableSeriesSource(s"mr_$i")
    OracleHarness.settingsAt(RandomFixtures.path(i)).foreach { case (k, v) => src.setConfig(k, v) }
    feed(evs, bulk)(src.addData(_, _, _), src.addData(_, _))
    src
  }

  private val validatedCounts = scala.collection.mutable.Map.empty[Int, Int]
  private val errBranches = scala.collection.mutable.Map.empty[Int, String]

  /** events + loaded-and-analyzed MutableSeriesSource per fixture, shared by
    * the two per-fixture tests (like KernelRandomDifferentialSpec.kernelRun):
    * each test stays self-sufficient under filtering, but a full-suite run
    * builds and analyzes our side once instead of twice. The REFERENCE
    * loaders are NOT shared — the expected-errors test must add its picks
    * before load(), so each test needs its own.
    */
  private val mineMemo =
    scala.collection.mutable.Map.empty[Int, (Seq[(String, String, String)], Range, MutableSeriesSource, Seq[graft.model.Flag])]
  private def mineRun(i: Int): (Seq[(String, String, String)], Range, MutableSeriesSource, Seq[graft.model.Flag]) =
    mineMemo.synchronized {
      mineMemo.getOrElseUpdate(
        i, {
          val (evs, bulk) = events(i)
          val mine = mineLoader(i, evs, bulk)
          mine.load()
          val flags = mine.analyze(AnalyzerRegistry.oracleSubset)
          (evs, bulk, mine, flags)
        }
      )
    }

  for (i <- 0 until N) {
    test(s"mutable fixture $i: processed points, resolution, and validate(1) match the reference") {
      val (evs, bulk, mine, _) = mineRun(i)
      val mineValidated = mine.validate(1).toMap

      // reference loaded WITHOUT expected errors: plain validate parity
      val ref = refLoader(i, evs, bulk)
      ref.load()
      val run = OracleHarness.wrap(ref)
      assert(mine.resolution == run.resolution, "final resolution")
      val minePts = mine.processedSeries
      assert(minePts.keySet == run.series.keySet, "series names")
      for ((name, pts) <- minePts) {
        val refPts = run.series(name).getData.asScala.map { case (k, v) => k.longValue() -> v.doubleValue() }.toMap
        assert(pts == refPts, s"series $name processed points")
      }

      val refList = new java.util.ArrayList[nl.us2.timeseriesoutlierdetection.ITimeserieAnalyzer]()
      OracleHarness.analyzerPairs.foreach { case (_, mk) => refList.add(mk()) }
      ref.analyze(refList)
      val refValidated = ref.validate(1).asScala.map(v => v.getTs -> v.getScore).toMap
      assert(mineValidated.keySet == refValidated.keySet, "validated outlier ts sets")
      for ((ts, s) <- mineValidated) {
        val r = refValidated(ts)
        assert(math.abs(s - r) <= 1e-9 * math.max(1.0, math.abs(r)), s"score at $ts: mine=$s ref=$r")
      }
      validatedCounts(i) = refValidated.size
    }

    test(s"mutable fixture $i: addExpectedError report + reference crash parity") {
      val (evs, bulk, mine, flags) = mineRun(i)
      val outlierTs = flags.filter(_.isOutlier).map(_.ts).distinct.sorted

      // shared two-pool pick generator (RandomFixtures.pickExpectedErrors):
      // aimed at kernel outlier buckets (in-bucket offsets collapse back in
      // the rebucket), and raw ts that usually carry no outlier record (the
      // reference's NPE-unbox pool); npeProb differs from the sidecar sweep
      // so the two suites land on different branch mixes
      val rnd = new Random((6400L + i) * 0x9E3779B97F4A7C15L)
      val dataTs = evs.map(_._2.trim.toLong).distinct.sorted.toIndexedSeq
      val picks = RandomFixtures.pickExpectedErrors(rnd, outlierTs, mine.resolution, dataTs, npeProb = 0.55)

      mine.addExpectedErrors(picks)
      val report = mine.expectedReport()

      // a fresh reference loader carrying the same picks (its rebucket runs
      // inside load(), so the picks must be present before it)
      val ref = refLoader(i, evs, bulk)
      picks.foreach(ref.addExpectedError)
      ref.load()
      assert(OracleHarness.expectedErrors(OracleHarness.wrap(ref)) == report.map(_._1), "rebucket+dedupe order")

      val refList = new java.util.ArrayList[nl.us2.timeseriesoutlierdetection.ITimeserieAnalyzer]()
      OracleHarness.analyzerPairs.foreach { case (_, mk) => refList.add(mk()) }
      ref.analyze(refList)
      if (report.forall(_._4)) {
        val refValidated = ref.validate(1).asScala.map(v => v.getTs -> v.getScore).toMap
        for ((ts, _, score, _) <- report if score >= 1.0) {
          val r = refValidated.get(ts)
          assert(r.isDefined, s"kernel validates expected ts $ts (score $score) but reference validate(1) omits it")
          assert(math.abs(r.get - score) <= 1e-9 * math.max(1.0, math.abs(score)), s"score at expected ts $ts")
        }
        errBranches(i) = "clean"
      } else {
        intercept[NullPointerException] { ref.validate(1) }
        errBranches(i) = "npe"
      }
    }
  }

  test("the mutable sweep is non-vacuous: several fixtures produce validated outliers") {
    assume(validatedCounts.size == N, "needs the per-fixture runs")
    assert(validatedCounts.count(_._2 > 0) >= 3, s"validated counts per fixture: $validatedCounts")
  }

  test("the mutable expected-errors sweep exercises BOTH reference branches") {
    assume(errBranches.size == N, "needs the per-fixture runs")
    assert(errBranches.values.toSet == Set("clean", "npe"), s"branches per fixture: $errBranches")
  }
}
