package graft.kernel

import org.apache.commons.math3.stat.regression.SimpleRegression
import scala.collection.immutable.TreeMap
import scala.collection.mutable

/** Port of the reference's scan-line interval/peak detector
  * (`IntervalInterceptorModel.java:14-439`, used by A8). Semantics preserved
  * verbatim, including:
  *   - scan starts at avg+σ, steps max((max−min)/10000, σ/3) downward;
  *   - per level: keep points ≥ scanValue, < previous level's floor, and
  *     outside avg ± 0.1σ; need ≥3 and <90% of all points;
  *   - chains of adjacent points become intervals keyed "l<len>_i<gap>";
  *     the most frequent key (java.util.HashMap iteration order tiebreak!)
  *     wins; accepted if occurrences ≥ 3 or coverage > 0.5, and coverage >
  *     0.1;
  *   - an empty interval key reaching the argmax throws on parse exactly
  *     like the reference (the analyzer catches it and skips the series);
  *   - non-pattern points feed a SimpleRegression; mse/tss summed across
  *     pattern-peak regressions + the non-pattern regression;
  *   - useLowRegression iff slopeStdErr < σ;
  *   - predict: σ=0 → avg; inside a projected peak window → peak regression;
  *     else non-pattern regression or NaN.
  *
  * Hot loops run over primitive arrays (the scan is O(levels·n)); the
  * reference's per-level TreeMaps are replaced by filtered parallel arrays
  * with identical iteration order (ascending ts).
  */
final class IntervalModel {
  private var data = TreeMap.empty[Long, Double]
  private var maxValue = java.lang.Double.MIN_VALUE
  private var minValue = java.lang.Double.MAX_VALUE
  private var isTrained = false
  private var avg = 0.0
  private var stdDev = 0.0
  private var _totalSumSquares = 0.0
  private var _meanSquareError = 0.0
  private var dataCount = 0
  private var tsDelta = -1L
  private var nonPatternRegression: SimpleRegression = _
  private val intervalPatterns = mutable.ArrayBuffer.empty[IntervalPattern]
  private var useLowRegression = false

  private val MinPatternCoverage = 0.1

  def addData(ts: Long, v: Double): Unit = {
    data = data.updated(ts, v)
    if (v < minValue) minValue = v
    if (v > maxValue) maxValue = v
    isTrained = false
  }

  def getMeanSquareError: Double = _meanSquareError
  def getTotalSumSquares: Double = _totalSumSquares
  def patternsFound: Boolean = isTrained && intervalPatterns.nonEmpty

  def train(): Unit = {
    val tsArr = new Array[Long](data.size)
    val vArr = new Array[Double](data.size)
    var k = 0
    for ((t, v) <- data) { tsArr(k) = t; vArr(k) = v; k += 1 }

    var total = 0.0
    dataCount = 0
    var tsPrev = -1L
    tsDelta = -1L
    var i = 0
    while (i < tsArr.length) {
      val ts = tsArr(i)
      if (tsPrev > -1L) {
        val nowDelta = ts - tsPrev
        if (tsDelta > -1 && nowDelta != tsDelta)
          throw new Exception("Timeseries time interval not consistent")
        tsDelta = nowDelta
      }
      tsPrev = ts
      total += vArr(i)
      dataCount += 1
      i += 1
    }
    avg = total / dataCount.toDouble
    var msqT = 0.0
    i = 0
    while (i < vArr.length) { msqT += math.pow(vArr(i) - avg, 2.0); i += 1 }
    stdDev = math.sqrt(msqT / dataCount.toDouble)
    if (stdDev == 0.0) {
      isTrained = true
      return
    }

    intervalPatterns.clear()

    var scanValue = avg + 1 * stdDev
    var maxScanValue = java.lang.Double.MAX_VALUE
    val maxIterations = 10000
    val scanStep = math.max((maxValue - minValue) / maxIterations, stdDev / 3)
    val fTs = new Array[Long](tsArr.length)
    val fV = new Array[Double](tsArr.length)
    var iter = 0
    var break = false
    while (iter < maxIterations && !break) {
      scanValue -= scanStep
      if (scanValue < minValue) break = true
      else {
        // filter pass: points ≥ scanValue, < maxScanValue, outside avg±0.1σ
        var fn = 0
        i = 0
        while (i < tsArr.length) {
          val v = vArr(i)
          val skip = v < scanValue || v >= maxScanValue ||
            (v >= avg - (0.1 * stdDev) && v <= avg + (0.1 * stdDev))
          if (!skip) { fTs(fn) = tsArr(i); fV(fn) = v; fn += 1 }
          i += 1
        }
        val usable = fn >= 3 && !(fn >= dataCount.toDouble * 0.9)
        if (usable) {
          // chain adjacent peaks into intervals
          var previousTs = fTs(0) - tsDelta
          var previousTsDelta = -1L
          var intervalStartTs = -1L
          var intervalLength = 0L
          var lastIntervalEndTs = -1L
          var possibleIntervalKey = ""
          // reference uses java.util.HashMap — iteration order matters for
          // the strict-> argmax below; replicate with the real thing.
          val possibleIntervals = new java.util.HashMap[String, Integer]()
          i = 0
          while (i < fn) {
            val ts = fTs(i)
            if (previousTs > -1L) {
              val nowDelta = ts - previousTs
              var endOfChain = false
              if (nowDelta != tsDelta) {
                if (intervalStartTs > -1L) {
                  endOfChain = true
                  if (lastIntervalEndTs > -1L) {
                    val timeBetweenIntervals = ts - intervalStartTs
                    possibleIntervalKey = "l" + intervalLength + "_i" + timeBetweenIntervals
                  }
                  lastIntervalEndTs = ts
                  intervalStartTs = -1L
                  intervalLength = 0L
                }
              }
              intervalLength += 1
              if (intervalStartTs == -1L) intervalStartTs = ts
              val intervalTsDelta = math.max(nowDelta, ts - intervalStartTs)
              if (endOfChain) {
                if (previousTsDelta > -1L) {
                  if (intervalTsDelta == previousTsDelta) {
                    val tmp = possibleIntervals.getOrDefault(possibleIntervalKey, 0) + 1
                    possibleIntervals.put(possibleIntervalKey, tmp)
                    possibleIntervalKey = ""
                  }
                }
                previousTsDelta = intervalTsDelta
              }
            }
            previousTs = ts
            i += 1
          }

          if (possibleIntervals.size() > 0) {
            var maxOccurence = Integer.MIN_VALUE
            var maxK = ""
            val it = possibleIntervals.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              if (e.getValue > maxOccurence) {
                maxOccurence = e.getValue
                maxK = e.getKey
              }
            }
            // parse "l<len>_i<gap>" — an empty key throws here, exactly like
            // the reference (caught by the analyzer, series skipped)
            val split = maxK.split("_")
            val length = Integer.parseInt(split(0).substring(1))
            val interval = Integer.parseInt(split(1).substring(1))

            val totalPatternLength = length * interval * maxOccurence
            val totalPatternCoverage =
              totalPatternLength.toDouble / (data.lastKey - data.firstKey).toDouble
            val occurenceThreshold = 3
            if (maxOccurence >= occurenceThreshold || totalPatternCoverage > 0.5) {
              if (totalPatternCoverage > MinPatternCoverage) {
                intervalPatterns += new IntervalPattern(
                  length,
                  interval,
                  java.util.Arrays.copyOf(fTs, fn),
                  java.util.Arrays.copyOf(fV, fn),
                  lastIntervalEndTs
                )
              }
            }
          }

          var minValFound = java.lang.Double.MAX_VALUE
          i = 0
          while (i < fn) { if (fV(i) < minValFound) minValFound = fV(i); i += 1 }
          scanValue = minValFound
          maxScanValue = minValFound
          if (scanValue < minValue) break = true
        }
        iter += 1
      }
    }

    nonPatternRegression = new SimpleRegression()
    i = 0
    while (i < tsArr.length) {
      if (!intervalPatterns.exists(_.containsTs(tsArr(i))))
        nonPatternRegression.addData(tsArr(i).toDouble, vArr(i))
      i += 1
    }

    _totalSumSquares = 0.0
    _totalSumSquares += nonPatternRegression.getTotalSumSquares
    _meanSquareError = 0.0
    _meanSquareError += nonPatternRegression.getMeanSquareError
    for (ip <- intervalPatterns) {
      _meanSquareError += ip.peakRegression.getMeanSquareError
      _totalSumSquares += ip.peakRegression.getTotalSumSquares
    }

    useLowRegression = nonPatternRegression.getSlopeStdErr < stdDev
    isTrained = true
  }

  def predict(ts: Long): Double = {
    if (!isTrained) throw new Exception("Not trained, call train()")
    if (stdDev == 0.0) return avg
    if (intervalPatterns.isEmpty) return Double.NaN
    for (ip <- intervalPatterns) {
      val prediction = ip.predict(ts)
      if (!prediction.isNaN) return prediction
    }
    if (!useLowRegression) Double.NaN
    else nonPatternRegression.predict(ts.toDouble)
  }

  private final class IntervalPattern(
      val length: Int,
      val interval: Int,
      val dpTs: Array[Long], // ascending — reference TreeMap order
      val dpV: Array[Double],
      val lastIntervalEndTs: Long
  ) {
    private val tsSet = {
      val s = new java.util.HashSet[java.lang.Long](dpTs.length * 2)
      dpTs.foreach(t => s.add(t))
      s
    }
    def containsTs(ts: Long): Boolean = tsSet.contains(ts)

    val peakRegression: SimpleRegression = {
      val r = new SimpleRegression()
      var i = 0
      while (i < dpTs.length) { r.addData(dpTs(i).toDouble, dpV(i)); i += 1 }
      r
    }

    def predict(ts: Long): Double = {
      val tSinceLastOccurrence = ts - lastIntervalEndTs
      // Java long division truncates toward zero, then (int)floor is a no-op
      val patternsMatched = (tSinceLastOccurrence / interval).toInt
      val normalized = tSinceLastOccurrence - (patternsMatched.toLong * interval)
      if (normalized >= 0 && normalized < length.toLong * tsDelta)
        peakRegression.predict(ts.toDouble)
      else Double.NaN
    }
  }
}
