package graft.kernel.forecast

import scala.collection.mutable

/** Scala reimplementation of the OpenForecast 0.5.0 time-based models
  * (public GPL library shipped with the reference at
  * `/root/reference/lib/OpenForecast-0.5.0.jar`), reproduced from bytecode
  * disassembly with identical FP operation order. Only the surface the
  * reference analyzers touch is ported: MovingAverageModel,
  * SimpleExponentialSmoothingModel.getBestFitModel, and the shared
  * AbstractTimeBasedModel/AbstractForecastingModel machinery
  * (`MovingAverageTimeserieAnalyzer.java:13-103`,
  * `SimpleExponentialSmoothingTimeserieAnalyzer.java:13-92`).
  */
object OF {
  val Tolerance = 1e-8 // AbstractForecastingModel.TOLERANCE

  final case class Accuracy(aic: Double, bias: Double, mad: Double, mape: Double, mse: Double, sae: Double)
}

/** AbstractTimeBasedModel + AbstractForecastingModel port. Input is a series
  * sorted ascending by time (the reference sorts via DataSet.sort). Lookups
  * use the reference's 1e-8 tolerance; an exact hash lookup fast-path is
  * sound because bucket timestamps are integral doubles (exact), with a
  * tolerance scan fallback for generality.
  */
abstract class TimeBasedModel {
  import OF.Tolerance

  protected var timeDiff: Double = 0.0
  protected var minTimeValue: Double = 0.0
  protected var maxTimeValue: Double = 0.0 // field default — NOT min of data

  private var obsTimes: Array[Double] = _
  private var obsValues: Array[Double] = _
  private val obsIndex = mutable.HashMap.empty[Double, Double]
  // forecast cache in insertion order (reference: DataSet linear scan)
  private val fcTimes = mutable.ArrayBuffer.empty[Double]
  private val fcValues = mutable.ArrayBuffer.empty[Double]
  private val fcIndex = mutable.HashMap.empty[Double, Double]

  var initialized: Boolean = false
  private var acc: OF.Accuracy = _

  protected def numberOfPeriods: Int
  protected def numberOfPredictors: Int = 1

  /** the model-specific recurrence — AbstractTimeBasedModel.forecast(double) */
  protected def forecastImpl(t: Double): Double

  def getMSE: Double = acc.mse
  def getMAD: Double = acc.mad
  def getMAPE: Double = acc.mape
  def getAIC: Double = acc.aic
  def getBias: Double = acc.bias

  protected def getObservedValue(t: Double): Double =
    obsIndex.get(t) match {
      case Some(v) => v
      case None =>
        var i = 0
        while (i < obsTimes.length) {
          if (math.abs(obsTimes(i) - t) < Tolerance) return obsValues(i)
          i += 1
        }
        throw new IllegalArgumentException(s"No observation found for time value, t=$t")
    }

  protected def hasObserved(t: Double): Boolean =
    obsIndex.contains(t) || obsTimes.exists(o => math.abs(o - t) < Tolerance)

  protected def getForecastValue(t: Double): Double = {
    if (t >= minTimeValue - Tolerance && t <= maxTimeValue + Tolerance) {
      fcIndex.get(t) match {
        case Some(v) => return v
        case None =>
          var i = 0
          while (i < fcTimes.length) {
            if (math.abs(fcTimes(i) - t) < Tolerance) return fcValues(i)
            i += 1
          }
      }
    }
    initForecastValue(t)
  }

  private def initForecastValue(t: Double): Double = {
    val f = forecastImpl(t)
    fcTimes += t
    fcValues += f
    fcIndex.getOrElseUpdate(t, f)
    if (t > maxTimeValue) maxTimeValue = t
    f
  }

  /** AbstractTimeBasedModel.init — requires ≥ numberOfPeriods points and
    * perfectly regular spacing (tolerance 1e-8); pre-computes forecasts for
    * the 3rd..last observed times; accuracy over observed minus the first
    * `periods` points.
    */
  def init(times: Array[Double], values: Array[Double]): Unit = {
    if (times.length == 0) throw new IllegalArgumentException("Data set cannot be empty in call to init.")
    val periods = numberOfPeriods
    if (times.length < periods)
      throw new IllegalArgumentException(
        s"Data set too small. Need $periods data points, but only ${times.length} passed to init."
      )
    obsTimes = times
    obsValues = values
    obsIndex.clear()
    var i = 0
    while (i < times.length) { obsIndex.getOrElseUpdate(times(i), values(i)); i += 1 }

    var lastTime = times(0)
    var currentTime = times(1)
    fcTimes.clear(); fcValues.clear(); fcIndex.clear()
    timeDiff = currentTime - lastTime
    minTimeValue = lastTime
    maxTimeValue = 0.0
    i = 2
    while (i < times.length) {
      lastTime = currentTime
      currentTime = times(i)
      val thisDiff = currentTime - lastTime
      if (math.abs(timeDiff - thisDiff) > Tolerance)
        throw new IllegalArgumentException(s"Inconsistent intervals found in time series, using variable 'ts'")
      try initForecastValue(currentTime)
      catch { case _: IllegalArgumentException => }
      i += 1
    }
    calculateAccuracyIndicators(times.drop(periods), values.drop(periods))
  }

  /** AbstractForecastingModel.calculateAccuracyIndicators — sets initialized
    * FIRST, then forecasts every accuracy point and accumulates error sums in
    * data order. AIC = n·ln(2π) + ln(sse/n) + 2(p+2).
    */
  protected def calculateAccuracyIndicators(ts: Array[Double], vs: Array[Double]): Unit = {
    initialized = true
    var sumErr = 0.0
    var sumAbsErr = 0.0
    var sumAbsPercentErr = 0.0
    var sumErrSquared = 0.0
    val fc = new Array[Double](ts.length)
    var i = 0
    while (i < ts.length) { fc(i) = getForecastValue(ts(i)); i += 1 }
    i = 0
    while (i < ts.length) {
      val x = vs(i)
      val err = fc(i) - x
      sumErr += err
      sumAbsErr += math.abs(err)
      sumAbsPercentErr += math.abs(err / x)
      sumErrSquared += err * err
      i += 1
    }
    val n = ts.length
    val p = numberOfPredictors
    acc = OF.Accuracy(
      aic = n.toDouble * math.log(2 * math.Pi) + math.log(sumErrSquared / n.toDouble) + (2 * (p + 2)).toDouble,
      bias = sumErr / n.toDouble,
      mad = sumAbsErr / n.toDouble,
      mape = sumAbsPercentErr / n.toDouble,
      mse = sumErrSquared / n.toDouble,
      sae = sumAbsErr
    )
  }

  /** public forecast(DataPoint) equivalent */
  def forecast(t: Double): Double = {
    if (!initialized) throw new IllegalStateException("Model not initialized")
    getForecastValue(t)
  }
}

/** WeightedMovingAverageModel with equal weights 1/period —
  * MovingAverageModel(int). forecast(t): if t − periods·Δ < minTime, echo the
  * observation at t; else Σ w[i]·observed(t−(periods−i)·Δ), substituting the
  * cached/recursive forecast where no observation exists.
  */
final class MovingAverageModel(period: Int) extends TimeBasedModel {
  private val weights: Array[Double] = Array.fill(period)(1.0 / period.toDouble)

  protected def numberOfPeriods: Int = weights.length

  protected def forecastImpl(t: Double): Double = {
    val periods = numberOfPeriods
    var t2 = t
    val dt = timeDiff
    if (t - dt * periods.toDouble < minTimeValue) return getObservedValue(t)
    var forecast = 0.0
    var i = periods - 1
    while (i >= 0) {
      t2 = t2 - dt
      forecast += (try weights(i) * getObservedValue(t2)
      catch { case _: IllegalArgumentException => weights(i) * getForecastValue(t2) })
      i -= 1
    }
    forecast
  }
}

/** SimpleExponentialSmoothingModel (HUNTER approach, the default):
  * ŷ(t) = α·obs(t−Δ) + (1−α)·ŷ(t−Δ); ŷ(t₀) = obs(t₀); for t beyond the
  * observed range the recurrence falls back to ŷ(maxTime).
  */
final class SesModel(val alpha: Double) extends TimeBasedModel {
  require(alpha >= 0.0 && alpha <= 1.0, s"Invalid smoothing constant, $alpha - must be in the range 0.0-1.0.")

  protected def numberOfPeriods: Int = 1

  protected def forecastImpl(t: Double): Double = {
    if (t - minTimeValue < OF.Tolerance) return getObservedValue(t)
    val previousTime = t - timeDiff
    try {
      // HUNTER (approach=1): alpha·observed(prev) + (1-alpha)·forecast(prev)
      alpha * getObservedValue(previousTime) + (1 - alpha) * getForecastValue(previousTime)
    } catch {
      case e: IllegalArgumentException =>
        if (t > maxTimeValue - OF.Tolerance) getForecastValue(maxTimeValue) else throw e
    }
  }
}

object SesModel {

  /** SimpleExponentialSmoothingModel.getBestFitModel: recursive 5-point
    * bracket search over α starting {0, 0.5, 1}, strict-< argmin of MSE,
    * endpoint-win returns immediately, bracket tolerance 1e-8 (the advertised
    * default tolerance parameter is ignored by the jar — it passes
    * AbstractForecastingModel.TOLERANCE).
    */
  def bestFit(times: Array[Double], values: Array[Double]): SesModel = {
    def mk(alpha: Double): SesModel = { val m = new SesModel(alpha); m.init(times, values); m }
    def find(lo: SesModel, mid: SesModel, hi: SesModel): SesModel = {
      if (math.abs(mid.alpha - lo.alpha) < OF.Tolerance && math.abs(hi.alpha - mid.alpha) < OF.Tolerance)
        return mid
      // reuse the already-fitted lo/mid/hi models: only the two midpoints
      // are new each level (same alphas → bit-identical result, 2.5× fewer
      // O(n) inits; SES best-fit dominated the detect kernel)
      val models = Array(
        lo,
        mk((lo.alpha + mid.alpha) / 2.0),
        mid,
        mk((mid.alpha + hi.alpha) / 2.0),
        hi
      )
      var best = 0
      var i = 1
      while (i < 5) {
        if (models(i).getMSE < models(best).getMSE) best = i
        i += 1
      }
      best match {
        case 1 => find(models(0), models(1), models(2))
        case 2 => find(models(1), models(2), models(3))
        case 3 => find(models(2), models(3), models(4))
        case _ => models(best) // endpoint wins → return immediately
      }
    }
    find(mk(0.0), mk(0.5), mk(1.0))
  }
}
