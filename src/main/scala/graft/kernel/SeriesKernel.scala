package graft.kernel

import graft.model.{EngineConfig, GapFillMode, NormalizationMode, TrainStats}
import scala.collection.immutable.TreeMap
import scala.collection.mutable

/** A (ts, value) point inside one series. Kernel code works on arrays of
  * these sorted ascending by ts.
  */
final case class Pt(ts: Long, v: Double)

/** Pure single-threaded series pipeline — the parity core. Each function
  * reproduces one reference operator bit-for-bit (citations per function).
  * No Spark imports; the Spark layer wraps these inside per-series
  * aggregations, and differential tests compare the two paths.
  */
object SeriesKernel {

  /** O2+O3: bucket timestamps (`ts - ts % res`, `AbstractDataLoader.java:137`)
    * and merge duplicate buckets by SUM (`AbstractDataLoader.java:144-151`).
    * Summation happens in ascending-ts order (deterministic); the reference
    * sums in HashMap order, which only matters for non-integral inputs (the
    * fixture corpus is integral → any order is exact).
    */
  def bucketSum(points: Iterable[Pt], res: Long): Array[Pt] = {
    // stable sort by bucket + sequential merge: same per-bucket summation
    // order as the TreeMap formulation (input order within a bucket), but
    // allocation-free in the hot loop
    val arr = points.iterator.map(p => Pt(p.ts - (p.ts % res), p.v)).toArray
    if (arr.isEmpty) return arr
    val sorted = arr.sortBy(_.ts) // scala sort is stable
    val out = new mutable.ArrayBuffer[Pt](sorted.length)
    var curTs = sorted(0).ts
    var acc = sorted(0).v
    var i = 1
    while (i < sorted.length) {
      val p = sorted(i)
      if (p.ts == curTs) acc += p.v
      else {
        out += Pt(curTs, acc)
        curTs = p.ts
        acc = p.v
      }
      i += 1
    }
    out += Pt(curTs, acc)
    out.toArray
  }

  /** O4: value normalization (`AbstractDataLoader.java:414-442`). */
  def normalizeValue(mode: NormalizationMode.Value, in: Double): Double = mode match {
    case NormalizationMode.Log =>
      if (in < 1 / Double.MaxValue) 0.0 else math.log(in)
    case NormalizationMode.Log10 =>
      if (in < 1 / Double.MaxValue) 0.0 else math.log10(in)
    case NormalizationMode.LogNatural =>
      if (in < 1 / Double.MaxValue) 0.0 else math.log1p(in)
    case NormalizationMode.Sqrt => math.sqrt(in)
    case _                      => in
  }

  /** O5: interior gap fill (`AbstractDataLoader.java:154-174`). Inserts
    * `(delta - res) / res` buckets between consecutive points whose spacing
    * exceeds `res`. Zero mode matches the reference exactly (fills 0.0);
    * Locf / Linear are north_star extensions.
    * Quirk preserved: a first point at ts 0 never triggers a gap check
    * (`tsPrev != 0` guard at `AbstractDataLoader.java:160`).
    */
  def gapFill(sorted: Array[Pt], res: Long, mode: GapFillMode.Value = GapFillMode.Zero): Array[Pt] = {
    if (sorted.length < 2) return sorted
    val out = mutable.ArrayBuffer.empty[Pt]
    var prev: Pt = null
    for (p <- sorted) {
      if (prev != null && prev.ts != 0 && (p.ts - prev.ts) != res) {
        val gapSize = ((p.ts - prev.ts) - res) / res
        var gapTs = prev.ts
        var i = 0L
        while (i < gapSize) {
          gapTs += res
          val v = mode match {
            case GapFillMode.Zero => 0.0
            case GapFillMode.Locf => prev.v
            case GapFillMode.Linear =>
              prev.v + (p.v - prev.v) * ((gapTs - prev.ts).toDouble / (p.ts - prev.ts).toDouble)
          }
          out += Pt(gapTs, v)
          i += 1
        }
      }
      out += p
      prev = p
    }
    out.toArray
  }

  /** O6 inner step: re-bucket a dense series by SUM, ascending order
    * (`Timeseries.rollup`, `Timeseries.java:54-61` — TreeMap iteration is
    * ascending, so ascending summation is exact parity).
    */
  def rollup(sorted: Array[Pt], res: Long): Array[Pt] = {
    // input is ascending; bucketing preserves order ⇒ sequential merge is
    // exactly the TreeMap's ascending summation
    if (sorted.isEmpty) return sorted
    val out = new mutable.ArrayBuffer[Pt](sorted.length)
    var curTs = sorted(0).ts - (sorted(0).ts % res)
    var acc = sorted(0).v
    var i = 1
    while (i < sorted.length) {
      val b = sorted(i).ts - (sorted(i).ts % res)
      if (b == curTs) acc += sorted(i).v
      else {
        out += Pt(curTs, acc)
        curTs = b
        acc = sorted(i).v
      }
      i += 1
    }
    out += Pt(curTs, acc)
    out.toArray
  }

  /** O6: the auto-rollup ladder decision (`AbstractDataLoader.java:263-287`).
    * Given the current size of the deciding series and current resolution,
    * returns the next resolution (or the same if no step applies).
    * size>1440 @60→300; >864 @300→900; >480 @900→1800.
    */
  def nextLadderResolution(size: Long, res: Long): Long =
    if (size > 1440 && res == 60) 300
    else if (size > 864 && res == 300) 900
    else if (size > 480 && res == 900) 1800
    else res

  /** O9: train/classify split counts (`Timeseries.java:75-79`):
    * trainN = floor(0.7 n); if n - trainN > forecastPeriods, trainN = n - forecastPeriods.
    */
  def trainCount(n: Long, forecastPeriods: Long): Long = {
    var trainN = math.floor(n.toDouble * 0.7).toLong
    if (n - trainN > forecastPeriods) trainN = n - forecastPeriods
    trainN
  }

  /** O10: train stats (`Timeseries._computeTrainStatics`,
    * `Timeseries.java:125-149`). Quirks preserved: max seeded with
    * `Double.MIN_VALUE` (smallest positive double — an all-negative series
    * reports max = 4.9e-324), min with `Double.MAX_VALUE`; population stddev
    * via `Math.pow(x-avg, 2)`; sums in ascending-ts order (TreeMap order in
    * the reference).
    */
  def computeStats(values: Array[Double]): TrainStats = {
    var max = java.lang.Double.MIN_VALUE
    var min = java.lang.Double.MAX_VALUE
    var total = 0.0
    var i = 0
    while (i < values.length) {
      val v = values(i)
      total += v
      if (v > max) max = v
      if (v < min) min = v
      i += 1
    }
    val avg = total / values.length.toDouble
    var msqT = 0.0
    i = 0
    while (i < values.length) {
      msqT += math.pow(values(i) - avg, 2.0)
      i += 1
    }
    TrainStats(avg, math.sqrt(msqT / values.length.toDouble), min, max, values.length.toLong)
  }

  /** O11: train sanitize (`Timeseries._sanitizeTrainData`,
    * `Timeseries.java:151-185`). Single pass: points outside avg ± 6·stddev
    * replaced by (avg + previousKeptValue)/2; previous starts at avg and is
    * only advanced by in-bounds ORIGINAL values; stats recomputed once if any
    * replacement happened. Returns (sanitized values, final stats).
    */
  def sanitize(values: Array[Double], stats: TrainStats): (Array[Double], TrainStats) = {
    val mp = 6.0
    val min = stats.avg - stats.stdDev * mp
    val max = stats.avg + stats.stdDev * mp
    var previous = stats.avg
    var replaced = 0
    val out = values.clone()
    var i = 0
    while (i < out.length) {
      val v = out(i)
      if (v < min || v > max) {
        out(i) = (stats.avg + previous) / 2.0
        replaced += 1
      } else {
        previous = v
      }
      i += 1
    }
    if (replaced > 0) (out, computeStats(out)) else (out, stats)
  }

  /** O12: train deltas (`Timeseries.getTrainDeltas`, `Timeseries.java:215-226`):
    * delta_i = v_i - v_{i-1} keyed at ts_i, over the (sanitized) train prefix.
    */
  def deltas(train: Array[Pt]): Array[Pt] = {
    if (train.length < 2) return Array.empty
    val out = new Array[Pt](train.length - 1)
    var i = 1
    while (i < train.length) {
      out(i - 1) = Pt(train(i).ts, train(i).v - train(i - 1).v)
      i += 1
    }
    out
  }

  /** O7: derived error_rate (`AbstractDataLoader._deriveErrorRate`,
    * `AbstractDataLoader.java:233-261`). Caller enforces the train-avg ≥ 10
    * gate. Iterates `regular`'s buckets; the reference unboxes
    * `error.get(ts)` (same key set by construction) — here an aligned lookup.
    */
  def errorRate(regular: Array[Pt], error: Map[Long, Double]): Array[Pt] =
    regular.map { p =>
      val errors = error(p.ts)
      val rate =
        if (p.v > 0 && errors > 0) errors / p.v
        else if (errors > 0) 1.0
        else 0.0
      Pt(p.ts, rate)
    }

  /** O13: expected-error re-bucket + order-preserving dedupe
    * (`AbstractDataLoader.java:402-410`).
    */
  def rebucketExpected(expected: Seq[Long], res: Long): Seq[Long] = {
    val seen = mutable.LinkedHashSet.empty[Long]
    expected.foreach(ts => seen += (ts - ts % res))
    seen.toSeq
  }

  /** V2: outlier magnitude (`TimeserieOutlier.getOutlierMagnitude`,
    * `TimeserieOutlier.java:56-73`): ln|((bound-val)/bound)| clamped to
    * [0, outlierScore]; NaN/Inf → 0.
    */
  def outlierMagnitude(value: Double, lb: Double, rb: Double, outlierScore: Double): Double = {
    var magnitude = 0.0
    if (value < lb) magnitude = math.max(0.0, math.log(math.abs((lb - value) / lb)))
    if (value > rb) magnitude = math.max(0.0, math.log(math.abs((rb - value) / rb)))
    if (magnitude.isInfinite || magnitude.isNaN) 0.0
    else math.min(magnitude, outlierScore)
  }
}
