package graft.pipeline

import graft.kernel.{AnalyzerRegistry, Pt, ScopePipeline}
import graft.model.EngineConfig
import graft.spark.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-path analyzer specs: alert-policy suppression parity with the
  * kernel, random-walk forecast on crafted trend data, seasonal-profile
  * regression on crafted periodic data, and the expected-errors report.
  */
class ColumnAnalyzersSpec extends SparkTestBase {

  /** long rows for one scope/metric from (bucket, value) pairs */
  private def series(metric: String, pts: Seq[(Long, Double)]): DataFrame = {
    val s = spark
    import s.implicits._
    pts.map { case (b, v) => ("s1", metric, b, v) }.toDF("scope", "metric", "bucket", "value")
  }

  test("alert policy: under-outliers on error series are suppressed, over kept") {
    // stable train (100 ± tiny), classify has one dip (50) and one spike (200)
    val base = (0 until 40).map(i => (i * 60L, 100.0 + (i % 3)))
    val classify = Seq((2400L, 50.0), (2460L, 200.0), (2520L, 100.0))
    for ((metric, expectSuppressed) <- Seq(("error", true), ("regular", false))) {
      val stats = SeriesOps.withSplitAndStats(series(metric, base ++ classify), 3)
      val flags = ColumnAnalyzers
        .zscoreFlags(stats)
        .select("bucket", "value", "is_outlier")
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
        .toSeq
      val spike = flags.find(_._1 == 2460L)
      assert(spike.exists(_._3), s"$metric spike must be an over-outlier")
      val dip = flags.find(_._1 == 2400L)
      if (expectSuppressed) assert(dip.isEmpty, "error-series under-outlier must be DROPPED (not inlier)")
      else assert(dip.exists(_._3), "regular-series under-outlier must be flagged")
    }
  }

  test("alert policy parity: scale-path flags match kernel on an error series") {
    val base = (0 until 40).map(i => (i * 60L, 100.0 + (i % 3)))
    val classify = Seq((2400L, 50.0), (2460L, 200.0), (2520L, 100.0))
    val pts = base ++ classify
    // kernel: NormalDistribution over metric "error" honors the alert policy
    val processed = ScopePipeline.process(
      Map("error" -> pts.map { case (b, v) => Pt(b, v) }),
      EngineConfig(resolution = 60, forecastPeriods = 3, autoRollup = false)
    )
    val kernelOutliers = AnalyzerRegistry.all
      .find(_.name == "NormalDistribution")
      .get
      .analyze("s1", processed.series.values)
      .filter(_.isOutlier)
      .map(_.ts)
      .toSet
    val scaleOutliers = ColumnAnalyzers
      .zscoreFlags(SeriesOps.withSplitAndStats(series("error", pts), 3))
      .where(col("is_outlier"))
      .select("bucket")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(scaleOutliers == kernelOutliers, "scale path must match kernel on error series")
    assert(!kernelOutliers.contains(2400L), "the dip must be suppressed by both")
  }

  test("lognormal scale path matches kernel flags on a stable series") {
    val base = (0 until 40).map(i => (i * 60L, 100.0 + (i % 3)))
    val classify = Seq((2400L, 500.0), (2460L, 101.0), (2520L, 20.0))
    val pts = base ++ classify
    val processed = ScopePipeline.process(
      Map("m" -> pts.map { case (b, v) => Pt(b, v) }),
      EngineConfig(resolution = 60, forecastPeriods = 3, autoRollup = false)
    )
    val kernel = AnalyzerRegistry.all
      .find(_.name == "LogNormalDistribution")
      .get
      .analyze("s1", processed.series.values)
      .map(f => f.ts -> ((f.value, f.lb, f.rb, f.isOutlier)))
      .toMap
    val scale = ColumnAnalyzers
      .logNormalFlags(SeriesOps.withSplitAndStats(series("m", pts), 3))
      .select("bucket", "value", "lb", "rb", "is_outlier")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(scale.keySet == kernel.keySet)
    for ((ts, (v, lb, rb, o)) <- scale) {
      val (kv, klb, krb, ko) = kernel(ts)
      assert(o == ko && math.abs(v - kv) < 1e-12 && math.abs(lb - klb) < 1e-12 && math.abs(rb - krb) < 1e-12, s"at $ts")
    }
    assert(scale.values.count(_._4) == 2, "the 500 spike and 20 dip are outliers")
  }

  test("random walk: constant-increment train forecasts the line; spike flagged") {
    // v = 10 + 2·i: deltas constant 2 → rel_mse 0, reliable; forecast
    // continues the line. One classify point breaks it.
    val pts = (0 until 50).map(i => (i * 60L, 10.0 + 2 * i)) :+ (3000L, 500.0)
    val stats = SeriesOps.withSplitAndStats(series("m", pts), 5)
    val fit = ColumnAnalyzers.randomWalkFit(stats).collect()
    assert(fit.length == 1 && fit.head.getAs[Boolean]("reliable"), fit.mkString)
    val flags = ColumnAnalyzers
      .randomWalkFlags(stats)
      .select("bucket", "value", "expected", "is_outlier")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(flags.nonEmpty)
    // on-line points: expected ≈ value, inliers
    for ((b, v, e, o) <- flags if b < 3000L) {
      assert(math.abs(e - v) < 1e-6, s"at $b expected $e vs $v")
      assert(!o, s"on-line point at $b flagged")
    }
    assert(flags.last._4, "the spike must be an outlier")
  }

  test("seasonal profile: hour-of-day linear pattern is reliable; break flagged") {
    // value = 10 + 0.01·hourOfDay over 14 days of hourly points (tiny slope
    // keeps the profile-OLS MSE under the 0.05 gate); last classify point
    // breaks the pattern hard.
    val n = 24 * 14
    val pts = (0 until n).map { i =>
      val hod = i % 24
      (i * 3600L, 10.0 + 0.01 * hod)
    } :+ ((n.toLong * 3600L), 50.0)
    val stats = SeriesOps.withSplitAndStats(series("m", pts), 10)
    val fit = ColumnAnalyzers.timeBucketFit(stats).collect()
    assert(fit.length == 1)
    val f = fit.head
    assert(f.getAs[Boolean]("reliable"), f.toString)
    assert(math.abs(f.getAs[Double]("slope") - 0.01) < 1e-9)
    assert(f.getAs[Long]("n_buckets") == 24)
    val flags = ColumnAnalyzers
      .timeBucketFlags(stats)
      .select("bucket", "is_outlier")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
      .toMap
    assert(flags(n.toLong * 3600L), "pattern break must be an outlier")
    assert(flags.count(!_._2) > 0, "pattern-following classify points are inliers")
  }

  test("mlr scale path matches kernel flags on a stable linear series") {
    val base = (0 until 40).map(i => (i * 60L, 50.0 + 0.5 * i + (i % 3)))
    val classify = Seq((2400L, 70.0), (2460L, 500.0), (2520L, 71.0))
    val pts = base ++ classify
    val processed = ScopePipeline.process(
      Map("m" -> pts.map { case (b, v) => Pt(b, v) }),
      EngineConfig(resolution = 60, forecastPeriods = 3, autoRollup = false)
    )
    val kernel = AnalyzerRegistry.all
      .find(_.name == "MultipleLinearRegression")
      .get
      .analyze("s1", processed.series.values)
      .map(f => f.ts -> f.isOutlier)
      .toMap
    val scale = ColumnAnalyzers
      .mlrFlags(SeriesOps.withSplitAndStats(series("m", pts), 3))
      .select("bucket", "is_outlier")
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
      .toMap
    assert(scale == kernel, s"scale $scale vs kernel $kernel")
    assert(scale(2460L), "the spike is an outlier on both paths")
  }

  test("expected-errors report: rebucket, dedupe, found/not-found, net score") {
    val s = spark
    import s.implicits._
    val base = (0 until 40).map(i => (i * 60L, 100.0 + (i % 3)))
    val classify = Seq((2400L, 50.0), (2460L, 200.0), (2520L, 100.0))
    val stats = SeriesOps.withSplitAndStats(series("m", base ++ classify), 3)
    val frames = Seq(ColumnAnalyzers.zscoreFlags(stats), ColumnAnalyzers.iqrFlags(stats))
    // raw labels: two aliases of bucket 2460 (dedupe), one at the quiet 2520,
    // one at a bucket with no flags at all (4800)
    val expected = Seq(("s1", 2465L), ("s1", 2470L), ("s1", 2525L), ("s1", 4805L)).toDF("scope", "ts")
    val rep = ColumnAnalyzers
      .expectedErrorReport(frames, expected, 60L)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(rep.size == 3, s"dedupe: $rep") // 2465/2470 collapse to 2460
    val (m1, s1, f1) = rep(2460L)
    assert(f1 && m1 == 2 && s1 == 6.0, s"spike: $rep") // 2 outliers à 3.0 (magnitude ln(...) < 0 → 0... or >0)
    val (m2, _, f2) = rep(2520L)
    assert(!f2 && m2 == 0, s"quiet bucket: $rep")
    val (m3, s3, f3) = rep(4800L)
    assert(!f3 && m3 == 0 && s3 == 0.0, s"missing bucket: $rep")
  }
}
