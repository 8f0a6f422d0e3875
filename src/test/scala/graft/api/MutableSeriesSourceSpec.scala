package graft.api

import graft.kernel.AnalyzerRegistry
import graft.model.{EngineConfig, GapFillMode, NormalizationMode}
import graft.pipeline.SeriesOps
import graft.spark.SparkTestBase
import nl.us2.timeseriesoutlierdetection._
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** S4 public programmatic loader: differential vs the reference
  * `MutableDataLoader`, plus the S3 settings→config wiring and the O4
  * DataFrame normalization analog.
  */
class MutableSeriesSourceSpec extends SparkTestBase {

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
    l.add(new TimeBucketSimpleRegressionTimeserieAnalyzer())
    l.add(new MultipleLinearRegressionTimeserieAnalyzer())
    l.add(new SimpleExponentialSmoothingTimeserieAnalyzer())
    l
  }

  /** constant line with a flat-out tail — mirrors the flat_out fixture shape */
  private def seriesData: Seq[(Long, Double)] = {
    val t0 = 1434880000L - 1434880000L % 60
    (0 until 40).map(i => (t0 + i * 60L, 100.0)) ++ (40 until 43).map(i => (t0 + i * 60L, 0.0))
  }

  test("programmatic source matches reference MutableDataLoader validate()") {
    val ref = new MutableDataLoader("spec")
    val mine = new MutableSeriesSource("spec")
    for ((ts, v) <- seriesData) {
      ref.addData("regular", ts.toString, v.toString)
      mine.addData("regular", ts.toString, v.toString)
    }
    ref.load()
    ref.analyze(referenceAnalyzers())
    val refValidated = ref.validate(1).asScala.map(v => v.getTs -> v.getScore).toMap

    mine.load()
    mine.analyze(AnalyzerRegistry.oracleSubset)
    val mineValidated = mine.validate(1).toMap

    assert(mineValidated.keySet == refValidated.keySet, "validated ts sets")
    for ((ts, s) <- mineValidated)
      assert(math.abs(s - refValidated(ts)) <= 1e-9 * math.max(1.0, math.abs(refValidated(ts))), s"score at $ts")
  }

  test("programmatic source: expected errors found; duplicate adds overwrite") {
    val src = new MutableSeriesSource("spec")
    for ((ts, v) <- seriesData) src.addData("regular", ts, v)
    // overwrite one train point (reference HashMap.put semantics)
    src.addData("regular", seriesData(5)._1, 100.0)
    // labels: the flat-out points, offset within the bucket to force rebucket
    val bad = seriesData.takeRight(3).map(_._1)
    src.addExpectedErrors(bad.map(_ + 13L))
    val report = src.load().expectedReport()
    assert(report.map(_._1) == bad, "rebucketed expected ts")
    assert(report.forall(_._4), s"all expected errors found: $report")
  }

  test("string-API raw semantics match the reference HashMap<String,String> exactly") {
    // distinct SPELLINGS of one numeric ts coexist and bucket-SUM at load
    // (the reference keys raw entries by the ts string; "0100" and "100"
    // are two map entries whose parsed buckets collide in processData)
    val t0 = 1434880000L - 1434880000L % 60
    val ref = new MutableDataLoader("spec")
    val mine = new MutableSeriesSource("spec")
    def addAll(add: (String, String) => Unit): Unit = {
      for (i <- 0 until 40) add((t0 + i * 60L).toString, "100.0")
      add("0" + t0.toString, "7.5") // alias of the first ts: must SUM, not overwrite
      add(t0.toString, "50.0") // identical spelling: must OVERWRITE the 100.0
    }
    addAll(ref.addData("regular", _, _))
    addAll(mine.addData("regular", _, _))
    ref.load()
    val tsField = classOf[AbstractDataLoader].getDeclaredField("timeseries")
    tsField.setAccessible(true)
    val refPts = tsField
      .get(ref)
      .asInstanceOf[java.util.HashMap[String, Timeseries]]
      .asScala("regular")
      .getData
      .asScala
      .map { case (k, v) => k.longValue() -> v.doubleValue() }
      .toMap
    val minePts = mine.load().processedSeries("regular")
    assert(minePts == refPts, "alias-sum + overwrite parity")
    assert(minePts(t0) == 57.5, s"bucket $t0: 50.0 overwrite + 7.5 alias")

    // ts parsing is STRICT at load (reference Long.parseLong, no trim) while
    // values tolerate surrounding whitespace (Double.parseDouble trims)
    val bad = new MutableSeriesSource("spec")
    bad.addData("regular", " 100", "1.0") // accepted at add...
    intercept[NumberFormatException] { bad.load() } // ...throws at load like the reference
    val refBad = new MutableDataLoader("spec")
    refBad.addData("regular", " 100", "1.0")
    intercept[NumberFormatException] { refBad.load() }
    val ws = new MutableSeriesSource("spec")
    for (i <- 0 until 20)
      ws.addData("regular", (120 + i * 60).toString, if (i == 0) " 1.5 " else "1.5")
    assert(ws.load().processedSeries("regular").values.sum == 30.0)
  }

  test("settings wiring: rollup/forecast_periods/gap_fill/normalization → EngineConfig") {
    val cfg = EngineConfig.fromSettings(
      Map(
        "rollup" -> "300",
        "forecast_periods" -> "5",
        "gap_fill" -> "locf",
        "normalization" -> "sqrt",
        "min_score" -> "2.5",
        "unknown_key" -> "ignored"
      )
    )
    // forecast_periods via a settings MAP is stored-but-inert, exactly the
    // reference's setConfig (AbstractDataLoader.java:57-62 applies only
    // rollup); the default 10 stands
    assert(cfg.resolution == 300L && cfg.forecastPeriods == 10L)
    assert(cfg.gapFill == GapFillMode.Locf && cfg.normalization == NormalizationMode.Sqrt)
    assert(cfg.minScore == 2.5)
    // ... and a non-numeric forecast_periods value never throws (inert means
    // unparsed, like the reference)
    assert(EngineConfig.fromSettings(Map("forecast_periods" -> "x1.5")).forecastPeriods == 10L)
    // the .settings sidecar path end-to-end (real_test_2 carries rollup=300)
    val sidecar = graft.sources.TsvSource.readSettings(
      spark,
      "/root/reference/src/main/resources/testdata/real_test_2.tsv"
    )
    assert(EngineConfig.fromSettings(sidecar).resolution == 300L)
    // programmatic setConfig path (reference setConfig("rollup", ...))
    val src = new MutableSeriesSource("s")
    src.setConfig("rollup", "300")
    assert(src.config.resolution == 300L)
    // resolution precedence is fixed, never map-iteration order: rollup (the
    // reference's only settings-path resolution key, AbstractDataLoader.java:59-62)
    // beats desired_time_resolution regardless of key order; the latter still
    // applies when rollup is absent
    assert(EngineConfig.fromSettings(Map("desired_time_resolution" -> "600", "rollup" -> "300")).resolution == 300L)
    assert(EngineConfig.fromSettings(Map("rollup" -> "300", "desired_time_resolution" -> "600")).resolution == 300L)
    assert(EngineConfig.fromSettings(Map("desired_time_resolution" -> "600")).resolution == 600L)
    assert(EngineConfig.fromSettings(Map("ROLLUP" -> "120")).resolution == 120L)
    // programmatic setters mirror the reference's EAGER field writes:
    // the LAST mutation wins between setConfig("rollup") and
    // setDesiredTimeResolution (AbstractDataLoader.java:57-72), unlike the
    // fixed map precedence above; forecast_periods changes ONLY via
    // setForecastPeriods; a malformed rollup value throws AT setConfig
    val m1 = new MutableSeriesSource("s")
    m1.setDesiredTimeResolution(600)
    m1.setConfig("Rollup", "300") // case-insensitive, like equalsIgnoreCase
    assert(m1.config.resolution == 300L)
    val m2 = new MutableSeriesSource("s")
    m2.setConfig("rollup", "300")
    m2.setDesiredTimeResolution(600)
    assert(m2.config.resolution == 600L)
    m2.setConfig("forecast_periods", "5") // stored, inert
    assert(m2.config.forecastPeriods == 10L)
    m2.setForecastPeriods(5)
    assert(m2.config.forecastPeriods == 5L)
    // the desired_time_resolution KEY is likewise inert via setConfig on
    // this reference-mirroring API (the fromSettings fallback on it is a
    // sidecar-path extension only) — the programmatic setter alone applies it
    val m3 = new MutableSeriesSource("s")
    m3.setConfig("Desired_Time_Resolution", "600")
    assert(m3.config.resolution == 60L)
    intercept[NumberFormatException] { m2.setConfig("rollup", "5m") }
    val refEager = new MutableDataLoader("s")
    intercept[NumberFormatException] { refEager.setConfig("rollup", "5m") }
    // getConfig + ctor name storage parity (the MutableDataLoader ctor does
    // setConfig("name", name), AbstractDataLoader.java:74-76)
    val g = new MutableSeriesSource("gcfg")
    val refG = new MutableDataLoader("gcfg")
    assert(g.getConfig("name", "") == refG.getConfig("name", ""))
    assert(g.getConfig("missing", "d") == refG.getConfig("missing", "d"))
    g.setConfig("k", "v"); refG.setConfig("k", "v")
    assert(g.getConfig("k", "") == refG.getConfig("k", ""))
  }

  test("asymmetric regular/error spans: crash parity and superset-error derive vs reference") {
    // Only the mutable API can produce regular/error series with different
    // ts spans (every TSV data line carries all columns). Gap fill runs per
    // series over its OWN min..max, so when `regular` starts EARLIER than
    // `error`, _deriveErrorRate reads a missing error bucket and the
    // reference NPE-unboxes (`AbstractDataLoader.java:246-248`); our kernel
    // crashes at the same point (SeriesKernel.errorRate map lookup).
    def feedAsym(single: (String, String, String) => Unit): Unit = {
      for (i <- 0 until 40) single("regular", (1700000000L + i * 60L).toString, "100.0")
      for (i <- 10 until 40) single("error", (1700000000L + i * 60L).toString, "50.0")
    }
    val mine = new MutableSeriesSource("asym")
    feedAsym(mine.addData)
    intercept[NoSuchElementException] { mine.load() }
    val ref = new MutableDataLoader("asym")
    feedAsym(ref.addData)
    intercept[NullPointerException] { ref.load() }

    // Superset direction: `error` spans WIDER than `regular` → derivation
    // succeeds, iterating regular's grid; the extra error buckets are
    // ignored. Points and end-to-end validate must match the reference.
    def feedSup(single: (String, String, String) => Unit): Unit = {
      for (i <- 10 until 40) single("regular", (1700000000L + i * 60L).toString, s"${100 + i}.0")
      for (i <- 0 until 50) single("error", (1700000000L + i * 60L).toString, s"${40 + i}.0")
    }
    val mineS = new MutableSeriesSource("sup")
    feedSup(mineS.addData)
    mineS.load()
    val refS = new MutableDataLoader("sup")
    feedSup(refS.addData)
    refS.load()
    val run = graft.kernel.OracleHarness.wrap(refS)
    assert(mineS.processedSeries.keySet == run.series.keySet)
    assert(mineS.processedSeries.keySet.contains("error_rate"), "superset-error must derive error_rate")
    for ((name, pts) <- mineS.processedSeries) {
      val refPts = run.series(name).getData.asScala.map { case (k, v) => k.longValue() -> v.doubleValue() }.toMap
      assert(pts == refPts, s"series $name points")
    }
    mineS.analyze(AnalyzerRegistry.oracleSubset)
    refS.analyze(referenceAnalyzers())
    val refV = refS.validate(1).asScala.map(v => v.getTs -> v.getScore).toMap
    val mineV = mineS.validate(1).toMap
    assert(mineV.keySet == refV.keySet, "validated ts sets")
    for ((ts, s) <- mineV)
      assert(math.abs(s - refV(ts)) <= 1e-9 * math.max(1.0, math.abs(refV(ts))), s"score at $ts")
  }

  test("O4 DataFrame normalize == kernel normalizeValue for every mode") {
    val s = spark
    import s.implicits._
    val vals = Seq(-3.0, 0.0, 1e-310, 0.5, 1.0, 100.0, 12345.678)
    val df = vals.map(v => ("s", "m", 0L, v)).toDF("scope", "metric", "bucket", "value")
    for (mode <- NormalizationMode.values.toSeq) {
      val got = SeriesOps.normalize(df, mode).select("value").collect().map(_.getDouble(0)).toSeq
      val want = vals.map(v => graft.kernel.SeriesKernel.normalizeValue(mode, v))
      for ((g, w) <- got.zip(want))
        assert(g == w || (g.isNaN && w.isNaN), s"$mode: $g vs $w")
    }
  }
}
