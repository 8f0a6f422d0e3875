package graft.kernel

/** One-class ν-SVM (Schölkopf et al. 2001) solved by SMO, following the
  * published LIBSVM algorithm (Chang & Lin) that jlibsvm ports — the
  * reference uses jlibsvm with an RBF kernel, γ=0.1, ν=0.05, ε=1e-5 and a
  * constant feature index, i.e. a 1-D one-class SVM over (float-cast) values
  * only (`OneClassSVMTimeserieAnalyzer.java:19-126`, `tsToIndex` `:118-125`).
  *
  * Optimization problem (LIBSVM formulation):
  *   min ½ αᵀQα  s.t. 0 ≤ αᵢ ≤ 1, Σαᵢ = ν·l
  * with Q_ij = K(x_i, x_j); initial point: first ⌊νl⌋ alphas = 1, the next
  * = νl − ⌊νl⌋, rest 0. Second-order working-set selection, termination at
  * gap < ε. Decision value f(x) = Σ αᵢK(x_i,x) − ρ.
  *
  * No runnable jlibsvm oracle exists offline; parity is asserted via the
  * ν-property, KKT checks and the 12-analyzer corpus contract (SURVEY §5.3.4).
  */
final class OneClassSvm(gamma: Double, nu: Double, eps: Double) {

  private var sv: Array[Double] = _ // support vector feature values
  private var coef: Array[Double] = _ // alpha_i for support vectors
  private var rho: Double = 0.0

  private def k(a: Double, b: Double): Double = {
    val d = a - b
    math.exp(-gamma * d * d)
  }

  /** Train on the (float-degraded) 1-D values. */
  def train(xs: Array[Double]): Unit = {
    val l = xs.length
    val alpha = new Array[Double](l)
    val n = (nu * l).toInt
    var i = 0
    while (i < n) { alpha(i) = 1.0; i += 1 }
    if (n < l) alpha(n) = nu * l - n

    // full kernel matrix — l is small (per-series train ≤ a few k points)
    val Q = Array.ofDim[Double](l, l)
    i = 0
    while (i < l) {
      var j = 0
      while (j < l) { Q(i)(j) = k(xs(i), xs(j)); j += 1 }
      i += 1
    }

    // gradient G_i = Σ_j alpha_j Q_ij  (p = 0 for one-class)
    val G = new Array[Double](l)
    i = 0
    while (i < l) {
      var g = 0.0
      var j = 0
      while (j < l) { g += alpha(j) * Q(i)(j); j += 1 }
      G(i) = g
      i += 1
    }

    val Cp = 1.0
    val tau = 1e-12
    val maxIter = math.max(10000000L, l.toLong * 100L)
    var iter = 0L
    var converged = false
    while (iter < maxIter && !converged) {
      // WSS: i = argmax_{alpha_t < C} -G_t ; j = second-order min over
      // {alpha_t > 0} with -G_t < -G_i ... (all y_t = +1 in one-class)
      var gmax = Double.NegativeInfinity
      var iSel = -1
      var t = 0
      while (t < l) {
        if (alpha(t) < Cp && -G(t) >= gmax) { gmax = -G(t); iSel = t }
        t += 1
      }
      var gmin = Double.PositiveInfinity
      var jSel = -1
      var objMin = Double.PositiveInfinity
      t = 0
      while (t < l) {
        if (alpha(t) > 0) {
          val gradDiff = gmax + G(t)
          if (-G(t) <= gmin) gmin = -G(t)
          if (gradDiff > 0) {
            val quadCoef = {
              val q = Q(iSel)(iSel) + Q(t)(t) - 2.0 * Q(iSel)(t)
              if (q > 0) q else tau
            }
            val objDiff = -(gradDiff * gradDiff) / quadCoef
            if (objDiff <= objMin) { objMin = objDiff; jSel = t }
          }
        }
        t += 1
      }

      if (gmax - gmin < eps || jSel == -1) converged = true
      else {
        // two-variable update on (iSel, jSel), both labels +1
        val quadCoef = {
          val q = Q(iSel)(iSel) + Q(jSel)(jSel) - 2.0 * Q(iSel)(jSel)
          if (q > 0) q else tau
        }
        var delta = (-G(iSel) + G(jSel)) / quadCoef
        val sum = alpha(iSel) + alpha(jSel)
        var ai = alpha(iSel) + delta
        var aj = alpha(jSel) - delta
        if (ai > Cp) { ai = Cp; aj = sum - Cp }
        if (aj < 0) { aj = 0; ai = sum }
        if (aj > Cp) { aj = Cp; ai = sum - Cp }
        if (ai < 0) { ai = 0; aj = sum }
        val dAi = ai - alpha(iSel)
        val dAj = aj - alpha(jSel)
        alpha(iSel) = ai
        alpha(jSel) = aj
        var u = 0
        while (u < l) {
          G(u) += Q(u)(iSel) * dAi + Q(u)(jSel) * dAj
          u += 1
        }
      }
      iter += 1
    }

    // rho: average G over free alphas (0 < alpha < C); fallback midpoint
    var nFree = 0
    var sumFree = 0.0
    var ub = Double.PositiveInfinity
    var lb = Double.NegativeInfinity
    i = 0
    while (i < l) {
      if (alpha(i) > 0 && alpha(i) < Cp) { nFree += 1; sumFree += G(i) }
      else if (alpha(i) == 0.0) { if (G(i) < ub) ub = G(i) }
      else { if (G(i) > lb) lb = G(i) }
      i += 1
    }
    rho = if (nFree > 0) sumFree / nFree else (ub + lb) / 2

    val svIdx = (0 until l).filter(alpha(_) > 0)
    sv = svIdx.map(xs(_)).toArray
    coef = svIdx.map(alpha(_)).toArray
  }

  /** Decision value f(x) = Σ αᵢK(svᵢ,x) − ρ; >0 inside, <0 outlier. */
  def predictValue(x: Double): Double = {
    var f = 0.0
    var i = 0
    while (i < sv.length) { f += coef(i) * k(sv(i), x); i += 1 }
    f - rho
  }
}
