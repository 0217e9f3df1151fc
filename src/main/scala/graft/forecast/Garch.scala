package graft.forecast

/** GARCH(1,1) by Gaussian quasi-MLE — rebuild of the reference's GARCH
  * operator (/root/reference/forcester_ts/garch.py:66-818): return
  * clipping at p99.5 (:156-168), (1,1) volatility recursion, EWMA
  * fallback when the sample is short or the fit fails to improve on it
  * (:580-633), persistence diagnostics (:519-579).
  *
  * Optimizer: Nelder–Mead over (ω, α, β) with a stationarity barrier
  * (α+β<1) — 3 parameters, no gradient needed, deterministic.
  */
object Garch {

  final case class Fit(omega: Double, alpha: Double, beta: Double,
      persistence: Double, logLik: Double, converged: Boolean, usedEwma: Boolean)

  def clip(returns: Array[Double], q: Double = 0.995): Array[Double] = {
    if (returns.length < 3) return returns
    val sortedAbs = returns.map(math.abs).sorted
    val cap = sortedAbs(math.min(sortedAbs.length - 1,
      math.floor(q * (sortedAbs.length - 1)).toInt))
    returns.map(r => math.max(-cap, math.min(cap, r)))
  }

  private def negLogLik(r: Array[Double], omega: Double, alpha: Double, beta: Double): Double = {
    if (omega <= 0 || alpha < 0 || beta < 0 || alpha + beta >= 0.9999) return 1e12
    val n = r.length
    var h = r.map(x => x * x).sum / n // unconditional init
    var nll = 0.0
    var i = 0
    while (i < n) {
      if (i > 0) h = omega + alpha * r(i - 1) * r(i - 1) + beta * h
      if (h <= 0) return 1e12
      nll += 0.5 * (math.log(2 * math.Pi) + math.log(h) + r(i) * r(i) / h)
      i += 1
    }
    nll
  }

  /** Deterministic Nelder–Mead — shared impl in [[LinAlg.nelderMead]]. */
  private def nelderMead(f: Array[Double] => Double, start: Array[Double],
      maxIter: Int = 400, tol: Double = 1e-10): (Array[Double], Double, Boolean) =
    LinAlg.nelderMead(f, start, maxIter, tol)

  /** Gaussian log-likelihood of the EWMA (IGARCH) variance filter
    * h_t = (1−λ)r²_{t−1} + λh_{t−1}. A dedicated recursion — the GARCH
    * negLogLik's stationarity barrier (α+β<1) would reject the IGARCH
    * point (α+β=1) outright, which made the fit-vs-fallback comparison
    * in fit() vacuous. */
  private[forecast] def ewmaNegLogLik(r: Array[Double], lambda: Double = 0.94): Double = {
    val n = r.length
    if (n == 0) return 1e12
    var h = r.map(x => x * x).sum / n // unconditional init, as in negLogLik
    var nll = 0.0
    var i = 0
    while (i < n) {
      if (i > 0) h = (1 - lambda) * r(i - 1) * r(i - 1) + lambda * h
      if (h <= 0) return 1e12
      nll += 0.5 * (math.log(2 * math.Pi) + math.log(h) + r(i) * r(i) / h)
      i += 1
    }
    nll
  }

  /** Fit GARCH(1,1); falls back to EWMA (λ=0.94) when the sample is
    * short or MLE fails to beat the EWMA-equivalent likelihood. */
  def fit(rawReturns: Array[Double], minObs: Int = 50): Fit = {
    val r = clip(rawReturns)
    val ewmaAsGarch = { // EWMA ≡ IGARCH(ω=0, α=1−λ, β=λ) — the fallback
      val l = 0.94
      Fit(0.0, 1 - l, l, 1.0, -ewmaNegLogLik(r, l), converged = false, usedEwma = true)
    }
    if (r.length < minObs) return ewmaAsGarch
    val v = r.map(x => x * x).sum / r.length
    val start = Array(0.05 * v, 0.08, 0.90)
    val (p, nll, conv) = nelderMead(a => negLogLik(r, a(0), a(1), a(2)), start)
    val fitLl = -nll
    if (!fitLl.isFinite || fitLl < ewmaAsGarch.logLik) ewmaAsGarch
    else Fit(p(0), p(1), p(2), p(1) + p(2), fitLl, conv, usedEwma = false)
  }

  /** h-step conditional variance forecast:
    * h_{t+k} = σ²_∞ + (α+β)^{k−1}(h_{t+1} − σ²_∞). */
  def forecastVol(returns: Array[Double], fit: Fit, horizon: Int): Array[Double] = {
    val r = clip(returns)
    if (r.isEmpty) return Array.fill(horizon)(0.0)
    if (fit.usedEwma) return Ewma.forecastVol(r, horizon)
    var h = r.map(x => x * x).sum / r.length
    var i = 1
    while (i < r.length) {
      h = fit.omega + fit.alpha * r(i - 1) * r(i - 1) + fit.beta * h
      i += 1
    }
    val h1 = fit.omega + fit.alpha * r.last * r.last + fit.beta * h
    val persistence = fit.alpha + fit.beta
    val longRun = if (persistence < 1) fit.omega / (1 - persistence) else h1
    (1 to horizon).map { k =>
      math.sqrt(math.max(0.0, longRun + math.pow(persistence, k - 1.0) * (h1 - longRun)))
    }.toArray
  }
}
