package graft.forecast

import org.scalatest.funsuite.AnyFunSuite

/** Exact state-space likelihood: the filter must reproduce the KNOWN
  * closed-form AR(1) exact likelihood, reject non-stationary
  * parameters, and as an MLE refinement recover ARMA parameters at
  * least as well as (and with higher exact likelihood than) the CSS
  * seed. */
class KalmanSpec extends AnyFunSuite {

  private def simulateArma(n: Int, phi: Double, theta: Double, seed: Long): Array[Double] = {
    val rng = new scala.util.Random(seed)
    val x = new Array[Double](n)
    var ePrev = 0.0
    var i = 0
    while (i < n) {
      val e = rng.nextGaussian()
      x(i) = (if (i > 0) phi * x(i - 1) else 0.0) + e + theta * ePrev
      ePrev = e
      i += 1
    }
    x
  }

  test("AR(1) concentrated likelihood matches the closed form exactly") {
    val z = simulateArma(500, 0.6, 0.0, seed = 3)
    val phi = 0.55 // evaluate at an off-truth point too
    val Some((ll, sigma2)) = Kalman.armaLoglik(z, Array(phi), Array.empty)
    // closed form: F_1 = 1/(1-phi^2), F_t = 1 after; v_1 = z_1,
    // v_t = z_t - phi z_{t-1}
    val n = z.length
    val f1 = 1.0 / (1 - phi * phi)
    val sumV2F = z(0) * z(0) / f1 +
      (1 until n).map(t => math.pow(z(t) - phi * z(t - 1), 2)).sum
    val s2 = sumV2F / n
    val expected = -0.5 * n * (math.log(2 * math.Pi) + 1) -
      0.5 * n * math.log(s2) - 0.5 * math.log(f1)
    assert(math.abs(ll - expected) < 1e-8, s"$ll vs $expected")
    assert(math.abs(sigma2 - s2) < 1e-10)
  }

  test("non-stationary and explosive parameters are rejected") {
    val z = simulateArma(200, 0.5, 0.0, seed = 4)
    assert(Kalman.armaLoglik(z, Array(1.05), Array.empty).isEmpty)
    assert(Kalman.armaLoglik(z, Array(1.0), Array.empty).isEmpty)
    assert(Kalman.armaLoglik(z, Array(0.9, 0.4), Array.empty).isEmpty) // roots outside
  }

  test("MLE refinement recovers ARMA(1,1) and improves the exact likelihood over CSS") {
    val x = simulateArma(3000, 0.6, 0.4, seed = 11)
    val css = Ar.fit(x, maxP = 3, maxQ = 1)
    assert(css.maCoefs.nonEmpty, "grid should select an MA term on ARMA data")
    val mle = Ar.mleRefine(x, css)
    def exactLl(f: Ar.Fit): Double = {
      val lags = ((1 to f.p) ++ f.seasonalLags).distinct.sorted.toArray
      val phiSum = f.coefs.sum
      val mu = if (math.abs(1 - phiSum) > 1e-8) f.intercept / (1 - phiSum) else 0.0
      Kalman.loglikSparse(x.map(_ - mu), lags, f.coefs, f.maLags, f.maCoefs)
        .map(_._1).getOrElse(Double.NegativeInfinity)
    }
    assert(exactLl(mle) >= exactLl(css) - 1e-6)
    assert(math.abs(mle.coefs(0) - 0.6) < 0.1, s"phi=${mle.coefs(0)}")
    assert(math.abs(mle.maCoefs(0) - 0.4) < 0.15, s"theta=${mle.maCoefs(0)}")
    assert(mle.sigma2 > 0.8 && mle.sigma2 < 1.2) // true innovation var = 1
  }

  test("fit(exactMle = true) runs the full ladder end-to-end and forecasts sanely") {
    val x = simulateArma(800, 0.7, 0.3, seed = 21).map(_ + 50.0)
    val f = Ar.fit(x, maxP = 3, maxQ = 1, exactMle = true)
    assert(f.sigma2 > 0 && !f.aic.isNaN)
    val (pred, lo, hi) = Ar.forecast(x, f, horizon = 5)
    assert(pred.length === 5 && pred.forall(v => !v.isNaN))
    assert((0 until 5).forall(i => lo(i) <= pred(i) && pred(i) <= hi(i)))
  }

  test("exactMle re-rank never mixes AIC spans: the chosen fit's AIC is exact (full n)") {
    // A CSS fallback's AIC spans n - t0 observations while exact-MLE AICs
    // span all n — the re-rank must compare only same-span candidates.
    // On a clean stationary ARMA series the exact pass must succeed, and
    // the marker of that is n == (differenced) series length.
    for (seed <- Seq(1L, 7L, 21L, 33L)) {
      val x = simulateArma(600, 0.5, 0.2, seed).map(_ + 10.0)
      val f = Ar.fit(x, maxP = 3, maxQ = 1, exactMle = true)
      val diffedLen = x.length - f.d - (if (f.ds > 0) f.dsSeason else 0)
      assert(f.n === diffedLen,
        s"seed=$seed: chosen fit spans ${f.n} of $diffedLen obs — a CSS fallback won the re-rank")
    }
  }

  test("levelFilter with q=0 and P0=r degenerates to the running mean") {
    // p=r, q=0: step t has gain 1/(t+1), so a_t is exactly the
    // incremental mean a + (y-a)/(t+1) — compare against the direct
    // running mean within fp tolerance (different summation order).
    val rng = new scala.util.Random(11)
    val y = Array.fill(200)(rng.nextDouble() * 100 - 30)
    val path = Kalman.levelFilter(y, q = 0.0, r = 3.0)
    var s = 0.0
    y.zipWithIndex.foreach { case (v, i) =>
      s += v
      assert(math.abs(path(i)._1 - s / (i + 1)) < 1e-9,
        s"level at $i drifted from the running mean")
    }
    // P shrinks like r/(t+1): monotone decreasing toward 0
    path.sliding(2).foreach { case Array(a, b) => assert(b._2 < a._2) }
  }

  test("levelFilter with tiny r tracks the observations; gain bounded in (0,1)") {
    val rng = new scala.util.Random(29)
    val y = Array.fill(100)(rng.nextDouble() * 10)
    val path = Kalman.levelFilter(y, q = 1.0, r = 1e-9)
    y.indices.drop(1).foreach { i =>
      assert(math.abs(path(i)._1 - y(i)) < 1e-6, s"level should chase y at r≈0 (i=$i)")
    }
    // steady-state variance solves P = (1-K)(P+q) with K=(P+q)/(P+q+r):
    // for q=1, r=1e-9 the fixed point is ~r — P stays tiny and positive
    assert(path.last._2 > 0 && path.last._2 < 1e-6)
  }
}
