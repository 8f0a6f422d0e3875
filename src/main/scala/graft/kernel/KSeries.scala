package graft.kernel

import graft.model.TrainStats

/** Kernel equivalent of the reference `Timeseries` (`Timeseries.java:10-226`):
  * one named series with train/classify split, cached (sanitized) train stats
  * and an alert policy. Immutable; `withData` replaces the points (reference
  * `setData`, which recomputes everything).
  */
final class KSeries private (
    val name: String,
    val data: Array[Pt], // sorted ascending, dense after gap-fill
    val forecastPeriods: Long,
    val alertOver: Boolean,
    val alertUnder: Boolean
) {
  require(
    data.length >= forecastPeriods,
    s"Not enough data available (${data.length}) to meet forecast desire ($forecastPeriods)"
  ) // `Timeseries.java:70-72`

  /** `Timeseries.java:75-79` */
  val trainN: Int = SeriesKernel.trainCount(data.length.toLong, forecastPeriods).toInt

  private val rawTrain: Array[Pt] = data.take(trainN)

  /** Sanitized train prefix + final stats (`Timeseries.java:102-123`:
    * getDataTrain computes stats then sanitizes, which may recompute stats).
    */
  val (train: Array[Pt], stats: TrainStats) = {
    val s0 = SeriesKernel.computeStats(rawTrain.map(_.v))
    val (vals, s1) = SeriesKernel.sanitize(rawTrain.map(_.v), s0)
    (rawTrain.zip(vals).map { case (p, v) => Pt(p.ts, v) }, s1)
  }

  /** `Timeseries.java:199-213` — classify suffix uses the ORIGINAL values. */
  val classify: Array[Pt] = data.drop(trainN)

  /** `Timeseries.getTrainDeltas` over the sanitized train. */
  def trainDeltas: Array[Pt] = SeriesKernel.deltas(train)

  /** `Timeseries.validateOutlier` (`Timeseries.java:27-37`). */
  def acceptOutlier(value: Double, lb: Double, rb: Double): Boolean = {
    if (value < lb && !alertUnder) false
    else if (value > rb && !alertOver) false
    else true
  }

  def withData(points: Array[Pt]): KSeries =
    new KSeries(name, points, forecastPeriods, alertOver, alertUnder)

  def withAlertPolicy(over: Boolean, under: Boolean): KSeries =
    new KSeries(name, data, forecastPeriods, over, under)

  def rollup(res: Long): KSeries = withData(SeriesKernel.rollup(data, res))
}

object KSeries {
  def apply(
      name: String,
      points: Array[Pt],
      forecastPeriods: Long = 10L,
      alertOver: Boolean = true,
      alertUnder: Boolean = true
  ): KSeries = new KSeries(name, points, forecastPeriods, alertOver, alertUnder)
}
