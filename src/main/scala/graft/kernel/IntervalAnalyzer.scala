package graft.kernel

import graft.model.Flag
import scala.collection.mutable

/** A8 (`IntervalInterceptorTimeserieAnalyzer.java:9-75`): scan-line interval
  * peak model. Inlier score is 3× the default (regular peaks look weird to
  * other models, so its inliers suppress harder). Gates: patterns found;
  * relMse = Σmse/Σtss ≤ 0.10. Bounds: lb = min(ŷ−σ, 0.6·ŷ),
  * rb = max(ŷ+σ, 1.4·ŷ); ŷ = NaN ⇒ both bound comparisons false ⇒ inlier.
  * Per-series exceptions are swallowed (reference try/catch).
  */
object IntervalInterceptorAnalyzer extends KAnalyzer {
  val name = "IntervalInterceptor"
  override def inlierScore: Double = 3.0

  def analyze(scope: String, series: Iterable[KSeries]): Seq[Flag] = {
    val out = mutable.ArrayBuffer.empty[Flag]
    for (s <- series) {
      try {
        val r = new IntervalModel
        for (p <- s.train) r.addData(p.ts, p.v)
        r.train()
        if (r.patternsFound) {
          val relMse = r.getMeanSquareError / r.getTotalSumSquares
          if (!(relMse > 0.10)) {
            val maxRelDif = 0.4
            for (p <- s.classify) {
              val e = r.predict(p.ts)
              val lb = math.min(e - s.stats.stdDev, e * (1 - maxRelDif))
              val rb = math.max(e + s.stats.stdDev, e * (1 + maxRelDif))
              out ++= classify(scope, s, p.ts, p.v, e, lb, rb)
            }
          }
        }
      } catch { case _: Exception => }
    }
    out.toSeq
  }
}
