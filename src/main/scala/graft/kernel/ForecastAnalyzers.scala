package graft.kernel

import graft.model.Flag
import graft.kernel.forecast.{MlrModel, MovingAverageModel, PolyModel, SesModel}
import scala.collection.mutable

/** Shared gate logic of the four OpenForecast-based analyzers:
  * relMse = model.MSE / TSS(train); skip if (relMse > maxMse && TSS > 0),
  * if (stddev > 0 && MAD > stddev), or if (MAD > avg).
  */
private[kernel] object ForecastGates {

  /** TSS over sanitized train values vs the (sanitized) train avg, via
    * Math.pow in ascending order — e.g. `MovingAverageTimeserieAnalyzer.java:40-44`.
    */
  def tsos(s: KSeries): Double = {
    var t = 0.0
    for (p <- s.train) t += math.pow(p.v - s.stats.avg, 2.0)
    t
  }

  def gatesPass(relMse: Double, maxMse: Double, tsosV: Double, mad: Double, s: KSeries): Boolean = {
    if (relMse > maxMse && tsosV > 0.0) return false
    if (s.stats.stdDev > 0 && mad > s.stats.stdDev) return false
    if (mad > s.stats.avg) return false
    true
  }
}

/** A5 (`MovingAverageTimeserieAnalyzer.java:13-103`): OpenForecast MA(10)
  * forecasts; bounds lb = min(ŷ−σ, ŷ(1−d)), rb = max(ŷ+σ, ŷ(1+d)),
  * d = max(0.5·relMse, 0.05). Per-series failures are swallowed (the
  * reference wraps each series in try/catch).
  */
object MovingAverageAnalyzer extends KAnalyzer {
  val name = "MovingAverage"
  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag] = {
    val out = mutable.ArrayBuffer.empty[Flag]
    for (s <- series) {
      try {
        val m = new MovingAverageModel(10)
        val tsosV = ForecastGates.tsos(s)
        m.init(s.train.map(_.ts.toDouble), s.train.map(_.v))
        val relMse = m.getMSE / tsosV
        if (ForecastGates.gatesPass(relMse, 0.05, tsosV, m.getMAD, s)) {
          val maxRelDif = math.max(0.5 * relMse, 0.05)
          for (p <- s.classify) {
            val e = m.forecast(p.ts.toDouble)
            val lb = math.min(e - s.stats.stdDev, e * (1 - maxRelDif))
            val rb = math.max(e + s.stats.stdDev, e * (1 + maxRelDif))
            out ++= classify(scope, s, p.ts, p.v, e, lb, rb)
          }
        }
      } catch { case _: Exception => }
    }
    out.toSeq
  }
}

/** A6 (`SimpleExponentialSmoothingTimeserieAnalyzer.java:13-92`): SES with
  * best-fit α (recursive 5-point bracket search, 1e-8); same gates/bounds
  * shape as A5. The reference has NO try/catch here — model failures
  * propagate; we preserve that for the corpus (trains are large enough).
  */
object SimpleExponentialSmoothingAnalyzer extends KAnalyzer {
  val name = "SimpleExponentialSmoothing"
  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag] = {
    val out = mutable.ArrayBuffer.empty[Flag]
    for (s <- series) {
      val tsosV = ForecastGates.tsos(s)
      val m = SesModel.bestFit(s.train.map(_.ts.toDouble), s.train.map(_.v))
      val relMse = m.getMSE / tsosV
      if (ForecastGates.gatesPass(relMse, 0.05, tsosV, m.getMAD, s)) {
        val maxRelDif = math.max(0.5 * relMse, 0.05)
        for (p <- s.classify) {
          val e = m.forecast(p.ts.toDouble)
          val lb = math.min(e - s.stats.stdDev, e * (1 - maxRelDif))
          val rb = math.max(e + s.stats.stdDev, e * (1 + maxRelDif))
          out ++= classify(scope, s, p.ts, p.v, e, lb, rb)
        }
      }
    }
    out.toSeq
  }
}

/** A7 (`PolynomialRegressionTimeserieAnalyzer.java:13-94`): order-10
  * polynomial on raw epoch ts (ill-conditioned by design), maxMse 0.02,
  * bounds as A5.
  */
object PolynomialRegressionAnalyzer extends KAnalyzer {
  val name = "PolynomialRegression"
  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag] = {
    val out = mutable.ArrayBuffer.empty[Flag]
    for (s <- series) {
      val m = new PolyModel(10)
      val tsosV = ForecastGates.tsos(s)
      m.init(s.train.map(_.ts.toDouble), s.train.map(_.v))
      val relMse = m.getMSE / tsosV
      if (ForecastGates.gatesPass(relMse, 0.02, tsosV, m.getMAD, s)) {
        val maxRelDif = math.max(0.5 * relMse, 0.05)
        for (p <- s.classify) {
          val e = m.predict(p.ts.toDouble)
          val lb = math.min(e - s.stats.stdDev, e * (1 - maxRelDif))
          val rb = math.max(e + s.stats.stdDev, e * (1 + maxRelDif))
          out ++= classify(scope, s, p.ts, p.v, e, lb, rb)
        }
      }
    }
    out.toSeq
  }
}

/** A12 (`MultipleLinearRegressionTimeserieAnalyzer.java:13-96`): OLS with
  * intercept via 2×3 normal equations + Gauss elimination, maxMse 0.02,
  * bounds ŷ ± 1.5·σ_train.
  */
object MultipleLinearRegressionAnalyzer extends KAnalyzer {
  val name = "MultipleLinearRegression"
  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag] = {
    val out = mutable.ArrayBuffer.empty[Flag]
    for (s <- series) {
      val m = new MlrModel
      val times = s.train.map(_.ts.toDouble)
      val values = s.train.map(_.v)
      m.init(times, values)
      val tsosV = ForecastGates.tsos(s)
      m.init(times, values) // the reference inits twice — preserved
      val relMse = m.getMSE / tsosV
      if (ForecastGates.gatesPass(relMse, 0.02, tsosV, m.getMAD, s)) {
        val maxErr = s.stats.stdDev * 1.5
        for (p <- s.classify) {
          val e = m.predict(p.ts.toDouble)
          val lb = e - maxErr
          val rb = e + maxErr
          out ++= classify(scope, s, p.ts, p.v, e, lb, rb)
        }
      }
    }
    out.toSeq
  }
}
