package graft.kernel

import graft.model.Flag
import org.apache.commons.math3.stat.regression.SimpleRegression
import scala.collection.mutable

/** One outlier/inlier classification pass over a scope's series map.
  * Kernel analyzers mirror the reference `ITimeserieAnalyzer`s exactly
  * (constants, gates, bounds, quirks); the Spark layer runs them per scope
  * inside `mapGroups` and/or re-expresses the pure-column ones as DataFrame
  * math (differentially tested against these).
  */
trait KAnalyzer extends Serializable {
  def name: String
  def outlierScore: Double = 3.0 // `AbstractTimeserieAnalyzer.java:14-23`
  def inlierScore: Double = 1.0

  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag]

  /** Build a flag honoring the series alert policy
    * (`Timeseries.validateOutlier`); returns None for suppressed outliers.
    */
  protected def classify(
      scope: String,
      s: KSeries,
      ts: Long,
      value: Double,
      expected: Double,
      lb: Double,
      rb: Double,
      inlierValue: Option[Double] = None
  ): Option[Flag] = {
    if (value < lb || value > rb) {
      if (!s.acceptOutlier(value, lb, rb)) None
      else Some(Flag(scope, s.name, name, ts, value, expected, lb, rb, isOutlier = true, outlierScore, inlierScore))
    } else {
      Some(
        Flag(scope, s.name, name, ts, inlierValue.getOrElse(value), expected, lb, rb,
          isOutlier = false, outlierScore, inlierScore)
      )
    }
  }
}

/** A1 (`NoopTimeserieAnalyzer.java:8-13`): contributes nothing. */
object NoopAnalyzer extends KAnalyzer {
  val name = "Noop"
  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag] = Seq.empty
}

/** A2 (`NormalDistributionTimeserieAnalyzer.java:10-49`): z-score band around
  * the sanitized train mean. Gate: stddev > 0.25·avg, or avg infinite, or
  * stddev NaN → series skipped. Bounds: avg ± max(1·stddev, 0.05·avg).
  */
object NormalDistributionAnalyzer extends KAnalyzer {
  val name = "NormalDistribution"
  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag] = {
    val out = mutable.ArrayBuffer.empty[Flag]
    for (s <- series) {
      val avg = s.stats.avg
      val stdDev = s.stats.stdDev
      val stdDevLim = 0.25 * avg
      if (!(stdDev > stdDevLim || avg.isInfinite || stdDev.isNaN)) {
        val maxErr = math.max(1.0 * stdDev, 0.05 * avg)
        val lb = avg - maxErr
        val rb = avg + maxErr
        for (p <- s.classify)
          out ++= classify(scope, s, p.ts, p.v, avg, lb, rb)
      }
    }
    out.toSeq
  }
}

/** A3 (`LogNormalDistributionTimeserieAnalyzer.java:10-77`): same band over
  * ln(value) with avg/stddev recomputed manually over converted train values.
  * convertValue: ln v, -Inf → 1/Double.MAX_VALUE. Gates: stddev > 0.05·avg;
  * stddev < 1/Double.MAX_VALUE. Quirk (SURVEY §5.2-Q3): outlier records carry
  * the log value, inlier records the raw value.
  */
object LogNormalDistributionAnalyzer extends KAnalyzer {
  val name = "LogNormalDistribution"

  private def convert(in: Double): Double = {
    val out = math.log(in)
    if (out.isInfinite) 1 / Double.MaxValue else out
  }

  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag] = {
    val out = mutable.ArrayBuffer.empty[Flag]
    for (s <- series) {
      var total = 0.0
      var count = 0L
      for (p <- s.train) { total += convert(p.v); count += 1 }
      val avg = total / count.toDouble
      var msqT = 0.0
      for (p <- s.train) msqT += math.pow(convert(p.v) - avg, 2.0)
      val stdDev = math.sqrt(msqT / count.toDouble)
      val reliable = !(stdDev > 0.05 * avg) && !(stdDev < 1 / Double.MaxValue)
      if (reliable) {
        val maxErr = math.max(1.0 * stdDev, 0.05 * avg)
        val lb = avg - maxErr
        val rb = avg + maxErr
        for (p <- s.classify) {
          val v = convert(p.v)
          out ++= classify(scope, s, p.ts, v, avg, lb, rb, inlierValue = Some(p.v))
        }
      }
    }
    out.toSeq
  }
}

/** A4 (`SimpleRegressionTimeserieAnalyzer.java:12-70`): commons-math3 OLS on
  * (ts, value) train points, ascending-ts insertion. Gate: relMse = SSE/TSS
  * (NaN→0) > 0.05 → skip. Bounds: ŷ·(1 ∓ max(0.5·relMse, 0.02)).
  */
object SimpleRegressionAnalyzer extends KAnalyzer {
  val name = "SimpleRegression"
  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag] = {
    val out = mutable.ArrayBuffer.empty[Flag]
    for (s <- series) {
      val r = new SimpleRegression()
      for (p <- s.train) r.addData(p.ts.toDouble, p.v)
      var relMse = r.getSumSquaredErrors / r.getTotalSumSquares
      if (relMse.isNaN) relMse = 0.0
      if (!(relMse > 0.05)) {
        val maxRelDif = math.max(0.5 * relMse, 0.02)
        for (p <- s.classify) {
          val expected = r.predict(p.ts.toDouble)
          val lb = expected * (1 - maxRelDif)
          val rb = expected * (1 + maxRelDif)
          out ++= classify(scope, s, p.ts, p.v, expected, lb, rb)
        }
      }
    }
    out.toSeq
  }
}

/** A9 (`RandomWalkRegressionTimeserieAnalyzer.java:12-67`): OLS on train
  * deltas; cumulative prediction seeded with the last (sanitized) train value:
  * ŷ_i = ŷ_{i-1} + r.predict(ts_i). Same gate/bounds as A4.
  */
object RandomWalkRegressionAnalyzer extends KAnalyzer {
  val name = "RandomWalkRegression"
  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag] = {
    val out = mutable.ArrayBuffer.empty[Flag]
    for (s <- series) {
      val r = new SimpleRegression()
      for (p <- s.trainDeltas) r.addData(p.ts.toDouble, p.v)
      var relMse = r.getSumSquaredErrors / r.getTotalSumSquares
      if (relMse.isNaN) relMse = 0.0
      if (!(relMse > 0.05)) {
        val maxRelDif = math.max(0.5 * relMse, 0.02)
        var previousVal = s.train.last.v
        for (p <- s.classify) {
          val expected = previousVal + r.predict(p.ts.toDouble)
          previousVal = expected
          val lb = expected * (1 - maxRelDif)
          val rb = expected * (1 + maxRelDif)
          out ++= classify(scope, s, p.ts, p.v, expected, lb, rb)
        }
      }
    }
    out.toSeq
  }
}

/** A11 (`TimeBucketSimpleRegressionTimeserieAnalyzer.java:12-127`): 4 seasonal
  * passes — (window,target,minBuckets,modulo) = (3600,60,60,0), (3600,60,12,5),
  * (3600,60,6,10), (86400,3600,24,0). Train: OLS on (bucketIdx → bucket mean).
  * Gates: #buckets < minBuckets; absolute MSE > 0.05. Bounds:
  * ŷ(bucketIdx) ± max(1·stddev_train, 0.05·avg_train). Outlier ts deduped
  * across passes (per series); inliers are NOT deduped (one per pass).
  *
  * Parity note: the reference feeds `r.addData` in `java.util.HashMap`
  * iteration order of the bucket keys; we use a real `java.util.HashMap` to
  * reproduce that order exactly (it affects commons-math3's updating sums).
  */
object TimeBucketSimpleRegressionAnalyzer extends KAnalyzer {
  val name = "TimeBucketSimpleRegression"

  private val passes = Array(
    (3600L, 60L, 60, 0), // minutely
    (3600L, 60L, 12, 5), // 5-minutely
    (3600L, 60L, 6, 10), // 10-minutely
    (86400L, 3600L, 24, 0) // hourly
  )

  private def transformTime(ts: Long, windowSeconds: Long, targetSeconds: Long, bucketModulo: Int): Int = {
    val whole = ts / windowSeconds
    val rest = ts - whole * windowSeconds
    var bucket = math.floor(rest.toDouble / targetSeconds.toDouble).toInt
    if (bucketModulo > 0) bucket = bucket - (bucket % bucketModulo)
    bucket
  }

  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag] = {
    val out = mutable.ArrayBuffer.empty[Flag]
    for (s <- series) {
      val seenOutlierTs = mutable.ArrayBuffer.empty[Long]
      for ((windowSeconds, targetSeconds, minBuckets, bucketModulo) <- passes) {
        val r = new SimpleRegression()
        val bucketTotals = new java.util.HashMap[java.lang.Long, java.lang.Double]()
        val bucketCounts = new java.util.HashMap[java.lang.Long, java.lang.Double]()
        for (p <- s.train) {
          val b: java.lang.Long = transformTime(p.ts, windowSeconds, targetSeconds, bucketModulo).toLong
          bucketTotals.put(b, bucketTotals.getOrDefault(b, 0.0) + p.v)
          bucketCounts.put(b, bucketCounts.getOrDefault(b, 0.0) + 1.0)
        }
        val it = bucketTotals.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          r.addData(e.getKey.doubleValue(), e.getValue / bucketCounts.get(e.getKey))
        }
        if (bucketTotals.size() >= minBuckets && !(r.getMeanSquareError > 0.05)) {
          val stdDev = s.stats.stdDev
          val avg = s.stats.avg
          val maxErr = math.max(1.0 * stdDev, 0.05 * avg)
          for (p <- s.classify) {
            val expected = r.predict(transformTime(p.ts, windowSeconds, targetSeconds, bucketModulo).toDouble)
            val lb = expected - maxErr
            val rb = expected + maxErr
            classify(scope, s, p.ts, p.v, expected, lb, rb).foreach { f =>
              if (f.isOutlier) {
                if (!seenOutlierTs.contains(p.ts)) {
                  seenOutlierTs += p.ts
                  out += f
                }
              } else out += f
            }
          }
        }
      }
    }
    out.toSeq
  }
}
