package graft.kernel.forecast

/** OpenForecast 0.5.0 regression models, ported from bytecode with identical
  * arithmetic order: PolynomialRegressionModel (order 10, i.e. degree 9,
  * `PolynomialRegressionTimeserieAnalyzer.java:13-94`) and
  * MultipleLinearRegressionModel with the single regressor "ts"
  * (`MultipleLinearRegressionTimeserieAnalyzer.java:13-96`). Both solve
  * normal equations via Utils.GaussElimination — forward elimination WITHOUT
  * pivoting, fixed row order, then back substitution. With epoch-second
  * timestamps the polynomial system computes ts^18 (≈1e164) and is
  * catastrophically ill-conditioned BY DESIGN; the analyzers' gates then
  * reject it. Do not "fix" by centering ts — that changes gate outcomes.
  */
object GaussElimination {

  /** Utils.GaussElimination(n, a) — a is n×(n+1), mutated in place. */
  def solve(n: Int, a: Array[Array[Double]]): Array[Double] = {
    var i = 0
    while (i < n - 1) {
      var j = i + 1
      while (j < n) {
        val ratio = a(j)(i) / a(i)(i)
        var k = i + 1
        while (k < n + 1) {
          a(j)(k) = a(j)(k) - ratio * a(i)(k)
          k += 1
        }
        a(j)(i) = 0.0
        j += 1
      }
      i += 1
    }
    val x = new Array[Double](n)
    x(n - 1) = a(n - 1)(n) / a(n - 1)(n - 1)
    i = n - 2
    while (i >= 0) {
      var sum = 0.0
      var j = i + 1
      while (j < n) {
        sum = sum + a(i)(j) * x(j)
        j += 1
      }
      x(i) = (a(i)(n) - sum) / a(i)(i)
      i -= 1
    }
    x
  }
}

/** Shared accuracy computation for the non-time-based models
  * (AbstractForecastingModel.calculateAccuracyIndicators over the full train
  * set, predictors = 1).
  */
trait PointForecaster {
  def predict(t: Double): Double

  var mse: Double = Double.NaN
  var mad: Double = Double.NaN
  var mape: Double = Double.NaN
  var aic: Double = Double.NaN
  var bias: Double = Double.NaN

  def computeAccuracy(times: Array[Double], values: Array[Double]): Unit = {
    var sumErr = 0.0
    var sumAbsErr = 0.0
    var sumAbsPercentErr = 0.0
    var sumErrSquared = 0.0
    var i = 0
    while (i < times.length) {
      val x = values(i)
      val err = predict(times(i)) - x
      sumErr += err
      sumAbsErr += math.abs(err)
      sumAbsPercentErr += math.abs(err / x)
      sumErrSquared += err * err
      i += 1
    }
    val n = times.length.toDouble
    mse = sumErrSquared / n
    mad = sumAbsErr / n
    mape = sumAbsPercentErr / n
    bias = sumErr / n
    aic = n * math.log(2 * math.Pi) + math.log(sumErrSquared / n) + 2.0 * (1 + 2)
  }
}

/** PolynomialRegressionModel("ts") — order 10: builds the 10×11 system
  * a[i][j] = Σ ts^(i+j) (j<10), a[i][10] = Σ v·ts^i via Math.pow in data
  * order, solves by pivot-free Gauss elimination; ŷ = Σ c_i·ts^i.
  */
final class PolyModel(order: Int = 10) {
  private var coefficient: Array[Double] = _
  private val acc = new PointForecaster {
    def predict(t: Double): Double = PolyModel.this.predict(t)
  }

  def init(times: Array[Double], values: Array[Double]): Unit = {
    val a = Array.ofDim[Double](order, order + 1)
    var i = 0
    while (i < order) {
      var j = 0
      while (j < order) {
        val k = i + j
        var p = 0
        while (p < times.length) {
          a(i)(j) = a(i)(j) + math.pow(times(p), k.toDouble)
          p += 1
        }
        j += 1
      }
      var p = 0
      while (p < times.length) {
        a(i)(order) = a(i)(order) + values(p) * math.pow(times(p), i.toDouble)
        p += 1
      }
      i += 1
    }
    coefficient = GaussElimination.solve(order, a)
    acc.computeAccuracy(times, values)
  }

  def predict(t: Double): Double = {
    var f = 0.0
    var i = 0
    while (i < order) {
      f = f + coefficient(i) * math.pow(t, i.toDouble)
      i += 1
    }
    f
  }

  def getMSE: Double = acc.mse
  def getMAD: Double = acc.mad
}

/** MultipleLinearRegressionModel with regressors {ts}: 2×3 augmented normal
  * equations [[n, Σts, Σv], [Σts, Σts², Σts·v]] accumulated per point in data
  * order, same elimination; ŷ = intercept + c·ts.
  */
final class MlrModel {
  private var intercept: Double = 0.0
  private var coef: Double = 0.0
  private val acc = new PointForecaster {
    def predict(t: Double): Double = MlrModel.this.predict(t)
  }

  def init(times: Array[Double], values: Array[Double]): Unit = {
    val n = 1 // one independent variable: ts
    val a = Array.ofDim[Double](n + 1, n + 2)
    var p = 0
    while (p < times.length) {
      val t = times(p)
      val y = values(p)
      var i = 0
      while (i < n + 1) {
        val rowFactor = if (i == 0) 1.0 else t
        var j = 0
        while (j < n + 2) {
          val colVal = if (j == n + 1) y else if (j == 0) 1.0 else t
          a(i)(j) = a(i)(j) + rowFactor * colVal
          j += 1
        }
        i += 1
      }
      p += 1
    }
    val x = GaussElimination.solve(a.length, a)
    intercept = x(0)
    coef = x(1)
    acc.computeAccuracy(times, values)
  }

  def predict(t: Double): Double = intercept + coef * t

  def getMSE: Double = acc.mse
  def getMAD: Double = acc.mad
}
