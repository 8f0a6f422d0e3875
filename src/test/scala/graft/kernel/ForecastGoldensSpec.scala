package graft.kernel

import graft.kernel.forecast.{MlrModel, MovingAverageModel, PolyModel, SesModel}
import net.sourceforge.openforecast.{DataSet, Observation}
import net.sourceforge.openforecast.models.{
  MovingAverageModel => OfMa,
  MultipleLinearRegressionModel => OfMlr,
  PolynomialRegressionModel => OfPoly,
  SimpleExponentialSmoothingModel => OfSes
}
import org.scalatest.funsuite.AnyFunSuite

/** Frozen goldens for the sequential forecast kernels (A5/A6/A7/A12 models),
  * cross-checked against the REAL OpenForecast-0.5.0.jar on the test
  * classpath (SURVEY §4.3): every assertion is EXACT double equality both
  * against the jar (bit-parity contract) and against literals frozen here,
  * so a numerics drift in a port fails a named per-model spec rather than
  * only the 23-fixture differential suite. The series is deterministic and
  * synthetic — trend + sine wobble + one spike, the shape the analyzers see.
  */
class ForecastGoldensSpec extends AnyFunSuite {

  // 40 points at 60 s cadence from a fixed epoch (regular spacing — the
  // time-based models require it); epoch-scale ts exactly as the analyzers
  // pass it for MA/SES/MLR
  private val times: Array[Double] = Array.tabulate(40)(i => 1.7e9 + 60.0 * i)
  // StrictMath, not math: Math.sin is only 1-ulp-accurate and may differ
  // across JVMs/architectures — the frozen literals below must reproduce
  // bit-exactly everywhere, so the INPUTS must too
  private val values: Array[Double] = Array.tabulate(40) { i =>
    50.0 + 0.3 * i + 7.0 * StrictMath.sin(i * 0.7) + (if (i == 25) 40.0 else 0.0)
  }
  // small-magnitude ts for the polynomial model: with epoch ts the order-10
  // system computes ts^18 ≈ 1e166 and overflows to non-finite (the gate
  // rejects it by design); index ts keeps every intermediate finite so the
  // elimination arithmetic itself is pinnable
  private val idxTimes: Array[Double] = Array.tabulate(40)(_.toDouble)

  private def ds(ts: Array[Double]) = {
    val d = new DataSet()
    var i = 0
    while (i < ts.length) {
      val o = new Observation(values(i))
      o.setIndependentValue("ts", ts(i))
      d.add(o)
      i += 1
    }
    d
  }

  private def point(t: Double) = {
    val o = new Observation(0.0)
    o.setIndependentValue("ts", t)
    o
  }

  test("A6 SES best-fit: kernel == jar, alpha/MSE/MAD/forecast frozen") {
    val ours = SesModel.bestFit(times, values)
    val jar = OfSes.getBestFitModel(ds(times))
    assert(ours.alpha == jar.getAlpha)
    assert(ours.getMSE == jar.getMSE && ours.getMAD == jar.getMAD && ours.getMAPE == jar.getMAPE)
    assert(ours.forecast(times.last + 60.0) == jar.forecast(point(times.last + 60.0)))
    // FROZEN: exact doubles from OpenForecast-0.5.0 on this series
    assert(ours.alpha == 0.1824394166469574)
    assert(ours.getMSE == 59.760607787953255)
    assert(ours.getMAD == 5.620014851394313)
    assert(ours.forecast(times.last + 60.0) == 62.64362129075475)
  }

  test("A5 MovingAverage(10): kernel == jar, MSE/MAD/forecast frozen") {
    val ours = new MovingAverageModel(10)
    ours.init(times, values)
    val jar = new OfMa(10)
    jar.init(ds(times))
    assert(ours.getMSE == jar.getMSE && ours.getMAD == jar.getMAD && ours.getAIC == jar.getAIC)
    assert(ours.forecast(times.last + 60.0) == jar.forecast(point(times.last + 60.0)))
    // FROZEN
    assert(ours.getMSE == 69.49110969878059)
    assert(ours.getMAD == 5.793884948804503)
    // AIC goes through Math.log (the kernel MUST keep Math.log — the jar
    // uses it, and parity is bit-exact per-JVM), which is only
    // 1-ulp-specified across architectures: pin to a tight tolerance, not
    // exact bits, so the suite holds on non-x86 JVMs while the jar-parity
    // assert above stays exact
    assert(math.abs(ours.getAIC - 65.37751081866574) <= 1e-12)
    assert(ours.forecast(times.last + 60.0) == 60.94580827499524)
  }

  test("A7 PolynomialRegression(order 10): kernel == jar, MSE/forecast frozen") {
    val ours = new PolyModel(10)
    ours.init(idxTimes, values)
    val jar = new OfPoly("ts", 10)
    jar.init(ds(idxTimes))
    assert(ours.getMSE == jar.getMSE && ours.getMAD == jar.getMAD)
    assert(ours.predict(41.0) == jar.forecast(point(41.0)))
    // FROZEN: pivot-free Gauss on Σ ts^k up to k=18 — any reordering of the
    // elimination arithmetic shifts these doubles
    assert(ours.getMSE == 35.73581457243682)
    assert(ours.getMAD == 3.922831734379052)
    assert(ours.predict(41.0) == 50.261759019835154)
  }

  test("A12 MultipleLinearRegression({ts}): kernel == jar, coefficients frozen") {
    val ours = new MlrModel
    ours.init(times, values)
    val jar = new OfMlr(Array("ts"))
    jar.init(ds(times))
    assert(ours.getMSE == jar.getMSE && ours.getMAD == jar.getMAD)
    assert(ours.predict(times.last + 60.0) == jar.forecast(point(times.last + 60.0)))
    // FROZEN (epoch-scale ts: the intercept is huge by design — the normal
    // equations are solved in raw ts space, gate decisions depend on it)
    assert(jar.getIntercept == -9600603.837684011)
    assert(jar.getCoefficients.get("ts") == 0.005647443839365555)
    assert(ours.getMSE == 48.692185416075574)
    assert(ours.predict(times.last + 60.0) == 64.24310264736414)
  }
}
