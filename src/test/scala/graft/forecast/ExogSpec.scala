package graft.forecast

import org.scalatest.funsuite.AnyFunSuite

/** ARX with exogenous regressors: VIF pruning drops collinear columns,
  * the OLS recovers known coefficients, and the forecast uses future
  * exog values. */
class ExogSpec extends AnyFunSuite {

  private def gen(n: Int, seed: Long): (Array[Double], Array[Double], Array[Double]) = {
    val rng = new scala.util.Random(seed)
    val x1 = Array.fill(n)(rng.nextGaussian())
    val y = new Array[Double](n)
    (1 until n).foreach(t => y(t) = 1.0 + 0.5 * y(t - 1) + 2.0 * x1(t) + 0.05 * rng.nextGaussian())
    val x2 = x1.map(v => 2.0 * v + 1e-9 * rng.nextGaussian()) // collinear copy
    (y, x1, x2)
  }

  test("VIF pruning drops a collinear duplicate but keeps independent columns") {
    val rng = new scala.util.Random(5)
    val a = Array.fill(300)(rng.nextGaussian())
    val b = Array.fill(300)(rng.nextGaussian())
    val aCopy = a.map(_ * 3.0)
    val kept = Exog.vifPrune(Array(a, b, aCopy))
    assert(kept.size === 2)
    assert(kept.contains(1)) // the independent column always survives
    assert(!(kept.contains(0) && kept.contains(2))) // only one of the pair
  }

  test("ARX recovers AR and exog coefficients; collinear exog is pruned first") {
    val (y, x1, x2) = gen(800, seed = 9)
    val fit = Exog.fitArx(y, Array(x1, x2), p = 1)
    assert(fit.keptExog.size === 1) // x2 is a scaled copy of x1
    assert(math.abs(fit.arCoefs(0) - 0.5) < 0.05, s"phi=${fit.arCoefs(0)}")
    val beta = fit.exogCoefs(0)
    // coefficient on whichever copy survived (x2 = 2*x1 => beta 1.0)
    val expected = if (fit.keptExog.head == 0) 2.0 else 1.0
    assert(math.abs(beta - expected) < 0.05, s"beta=$beta vs $expected")
    assert(fit.sigma2 < 0.01) // noise sd 0.05 => var 0.0025
  }

  test("forecast with known future exog tracks the generating process") {
    val (y, x1, _) = gen(800, seed = 21)
    val fit = Exog.fitArx(y, Array(x1), p = 1)
    // future exog pinned at zero: prediction decays toward the intercept-
    // driven mean mu = c / (1 - phi)
    val preds = Exog.forecast(y, fit, Array.fill(20)(Array(0.0)), horizon = 20)
    val mu = fit.intercept / (1 - fit.arCoefs(0))
    assert(math.abs(preds.last - mu) < 0.1, s"${preds.last} vs $mu")
    // a large positive exog shock lifts the one-step forecast by ~beta*shock
    val shocked = Exog.forecast(y, fit, Array(Array(1.0)), horizon = 1)
    val base = Exog.forecast(y, fit, Array(Array(0.0)), horizon = 1)
    assert(math.abs((shocked(0) - base(0)) - fit.exogCoefs(0)) < 1e-9)
  }

  test("no-exog ARX degenerates to a plain AR fit") {
    val (y, _, _) = gen(500, seed = 3)
    val fit = Exog.fitArx(y, Array.empty, p = 2)
    assert(fit.keptExog.isEmpty && fit.exogCoefs.isEmpty)
    assert(!fit.aic.isNaN && fit.sigma2 > 0)
  }
}
