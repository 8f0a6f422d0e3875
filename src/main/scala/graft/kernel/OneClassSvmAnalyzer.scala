package graft.kernel

import graft.model.Flag
import scala.collection.mutable

/** A10 (`OneClassSVMTimeserieAnalyzer.java:19-126`): 1-D one-class RBF SVM
  * over values only (γ=0.1f, ν=0.05f, ε=1e-5f, no scaling; the ts→index map
  * returns the constant 1). Trained on the first ⌊0.7·trainN⌋ sanitized
  * train points. Self-validation quirk preserved: the reference's
  * `samplesProcessed` counter is NOT reset before the validation loop, so
  * validation actually tests EVERY train point (not the held-out 30%); gate:
  * matched/tested ≥ 0.9. Classification: decision < 0 → outlier with NaN
  * expected/lb/rb (alert policy never suppresses NaN bounds); else inlier.
  * Inlier score 3×. Values are degraded through float exactly like the
  * reference's convertVal.
  */
object OneClassSvmAnalyzer extends KAnalyzer {
  val name = "OneClassSVM"
  override def inlierScore: Double = 3.0

  private val MinValidationRate = 0.9
  private val Gamma = 0.1f.toDouble
  private val Nu = 0.05f.toDouble
  private val Eps = 1e-5f.toDouble

  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag] = {
    val out = mutable.ArrayBuffer.empty[Flag]
    for (s <- series) {
      val trainSamples = math.floor(s.train.length * 0.7).toInt
      if (trainSamples > 0) {
        val xs = s.train.take(trainSamples).map(p => p.v.toFloat.toDouble)
        val svm = new OneClassSvm(Gamma, Nu, Eps)
        svm.train(xs)

        // validation over ALL train points (reference counter quirk)
        var matched = 0
        var tested = 0
        for (p <- s.train) {
          tested += 1
          if (svm.predictValue(p.v.toFloat.toDouble) > 0) matched += 1
        }
        val validationRate = matched.toDouble / tested.toDouble
        if (validationRate >= MinValidationRate) {
          for (p <- s.classify) {
            val prob = svm.predictValue(p.v.toFloat.toDouble)
            if (prob < 0) {
              // NaN bounds are never suppressed by the alert policy
              out += Flag(scope, s.name, name, p.ts, p.v, Double.NaN, Double.NaN, Double.NaN,
                isOutlier = true, outlierScore, inlierScore)
            } else {
              out += Flag(scope, s.name, name, p.ts, p.v, Double.NaN, Double.NaN, Double.NaN,
                isOutlier = false, outlierScore, inlierScore)
            }
          }
        }
      }
    }
    out.toSeq
  }
}
