package graft.pipeline

import graft.kernel.SeriesKernel
import graft.spark.SparkTestBase
import org.apache.spark.sql.functions._

/** O11 differential: the distributed window-expression sanitize must equal
  * the kernel's sequential recurrence exactly — including consecutive
  * outliers (previousKept frozen across them), a leading outlier (previous
  * seeded with avg), and the post-sanitize recomputed stats.
  */
class SanitizeSpec extends SparkTestBase {

  test("withSanitizedTrain equals kernel sanitize, incl. consecutive/leading outliers") {
    val s = spark
    import s.implicits._
    // crafted series: stable band ~100 with a LEADING spike, two CONSECUTIVE
    // spikes (regression for previous-kept freezing) and a negative spike.
    // The band must be LONG: a spike among n points maxes out at ~√n σ
    // (Chebyshev), so >6σ needs n ≳ 40 per spike — 210 points, 4 spikes.
    val values = Array.tabulate(210) {
      case 0        => 10000.0 // leading: previous-kept seeds with avg
      case 50       => 12000.0 // consecutive pair: previous frozen across both
      case 51       => 11000.0
      case 120      => -9000.0
      case i        => 100.0 + (i % 7)
    }
    val n = values.length
    val trainN = SeriesKernel.trainCount(n.toLong, 10).toInt

    // kernel ground truth over the train prefix
    val train = values.take(trainN)
    val stats0 = SeriesKernel.computeStats(train)
    val (sanK, statsK) = SeriesKernel.sanitize(train, stats0)
    assert(sanK.count(i => true) == trainN)
    assert(!sanK.sameElements(train), "fixture must actually trigger replacements")

    val df = values.zipWithIndex
      .map { case (v, i) => ("s1", "value", 1000L + i * 60, v) }
      .toSeq
      .toDF("scope", "metric", "bucket", "value")
    val out = SeriesOps
      .withSanitizedTrain(SeriesOps.withSplitAndStats(df, 10))
      .where(col("is_train"))
      .orderBy("bucket")
      .select("value_san", "was_replaced", "san_avg", "san_stddev")
      .collect()

    assert(out.length == trainN)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getDouble(0) - sanK(i)) < 1e-9, s"value_san at $i: ${r.getDouble(0)} vs ${sanK(i)}")
      assert(r.getBoolean(1) == (sanK(i) != train(i)), s"was_replaced at $i")
    }
    assert(math.abs(out.head.getDouble(2) - statsK.avg) < 1e-9, "san_avg")
    assert(math.abs(out.head.getDouble(3) - statsK.stdDev) < 1e-9, "san_stddev")
  }

  test("no-outlier series: sanitize is the identity, stats unchanged") {
    val s = spark
    import s.implicits._
    val df = (0 until 40)
      .map(i => ("s1", "value", 1000L + i * 60, 100.0 + (i % 7)))
      .toDF("scope", "metric", "bucket", "value")
    val out = SeriesOps
      .withSanitizedTrain(SeriesOps.withSplitAndStats(df, 10))
      .where(col("is_train"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Double]("value_san") == r.getAs[Double]("value"))
      assert(!r.getAs[Boolean]("was_replaced"))
      assert(math.abs(r.getAs[Double]("san_avg") - r.getAs[Double]("train_avg")) < 1e-12)
    }
  }
}
