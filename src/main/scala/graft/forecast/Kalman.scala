package graft.forecast

import breeze.linalg.{DenseMatrix, DenseVector}

/** Exact Gaussian likelihood of an ARMA(p, q) process via the Kalman
  * filter on Harvey's state-space form — the "exact state-space MLE"
  * tier of the reference's statsmodels SARIMAX
  * (/root/reference/forcester_ts/sarimax.py:431-707 calls
  * `SARIMAX(...).fit()`, whose default objective is exactly this
  * likelihood), completing the HR → CSS → MLE refinement ladder.
  *
  * State dim m = max(maxArLag, maxMaLag + 1); companion transition
  *   T = [phi | I; phi_m | 0],  R = (1, theta_1..theta_{m-1})',
  *   y_t = alpha_t(0)  (zero-mean series; the mean is a parameter).
  *
  * The innovation variance is CONCENTRATED out: the filter runs with
  * unit variance, sigma2_hat = mean(v_t^2 / F_t), and
  *   ll = -n/2 (ln 2pi + 1) - n/2 ln sigma2_hat - 1/2 sum ln F_t.
  *
  * Initialization is the exact stationary covariance, solved by the
  * doubling iteration P = sum_k A^k Q A'^k (A_{k+1} = A_k^2 — a
  * geometric Lyapunov solve, ~40 tiny matrix products); a transition
  * whose powers do not decay (non-stationary candidate) is rejected
  * with -inf, which is also how the Nelder-Mead search is kept inside
  * the stationary region. Once the covariance recursion reaches its
  * steady state the gain is frozen (statsmodels' own fast path), so a
  * long series costs O(n m) after the first few dozen steps.
  */
object Kalman {

  /** Concentrated exact log-likelihood of zero-mean ARMA with DENSE
    * coefficient arrays (index i = lag i+1). Returns (ll, sigma2Hat),
    * or None when the parameters are non-stationary / numerically
    * unusable. */
  def armaLoglik(z: Array[Double], phi: Array[Double], theta: Array[Double])
      : Option[(Double, Double)] = {
    val n = z.length
    if (n < 3) return None
    val m = math.max(math.max(phi.length, theta.length + 1), 1)
    val t = DenseMatrix.zeros[Double](m, m)
    (0 until m).foreach { i =>
      if (i < phi.length) t(i, 0) = phi(i)
      if (i + 1 < m) t(i, i + 1) = 1.0
    }
    val r = DenseVector.zeros[Double](m)
    r(0) = 1.0
    (0 until theta.length).foreach(j => r(j + 1) = theta(j))
    val q = r * r.t // R R' (unit innovation variance)

    // stationary P0 = sum_k A^k Q A'^k by doubling
    var p = q.copy
    var a = t.copy
    var it = 0
    var decayed = false
    while (it < 60 && !decayed) {
      p = p + a * p * a.t
      a = a * a
      val an = breeze.linalg.max(breeze.numerics.abs(a))
      if (an.isNaN || an.isInfinite || an > 1e12) return None // explosive
      if (an < 1e-14) decayed = true
      it += 1
    }
    if (!decayed) return None // spectral radius too close to / above 1

    val av = DenseVector.zeros[Double](m) // a_t (zero-mean start)
    var sumLogF = 0.0
    var sumV2F = 0.0
    var steady = false
    var kGain: DenseVector[Double] = null
    var f = 0.0
    var i = 0
    while (i < n) {
      if (!steady) {
        f = p(0, 0)
        if (!(f > 1e-300) || f.isNaN) return None
        kGain = (t * p(::, 0)) / f
      }
      val v = z(i) - av(0)
      sumLogF += math.log(f)
      sumV2F += v * v / f
      av := t * av + kGain * v
      if (!steady) {
        val pNext = t * p * t.t + q - (kGain * kGain.t) * f
        val diff = breeze.linalg.max(breeze.numerics.abs(pNext - p))
        p = pNext
        if (diff < 1e-13) steady = true
      }
      i += 1
    }
    val sigma2 = sumV2F / n
    if (!(sigma2 > 0) || sigma2.isNaN) return None
    val ll = -0.5 * n * (math.log(2 * math.Pi) + 1) -
      0.5 * n * math.log(sigma2) - 0.5 * sumLogF
    if (ll.isNaN || ll.isInfinite) None else Some((ll, sigma2))
  }

  /** armaLoglik over SPARSE lag sets (the shape [[Ar.Fit]] stores):
    * coefficients are scattered into dense arrays indexed by lag. */
  def loglikSparse(z: Array[Double], arLags: Array[Int], arCoefs: Array[Double],
      maLags: Array[Int], maCoefs: Array[Double]): Option[(Double, Double)] = {
    val phi = new Array[Double](if (arLags.isEmpty) 0 else arLags.max)
    arLags.zip(arCoefs).foreach { case (l, c) => phi(l - 1) = c }
    val theta = new Array[Double](if (maLags.isEmpty) 0 else maLags.max)
    maLags.zip(maCoefs).foreach { case (l, c) => theta(l - 1) = c }
    armaLoglik(z, phi, theta)
  }

  /** Local-level (random-walk-plus-noise) Kalman filter with fixed state
    * noise `q` and observation noise `r`: a₀ = y₀, P₀ = r; then per step
    * P⁻ = P + q, K = P⁻/(P⁻ + r), a += K·(y − a), P = (1 − K)·P⁻.
    * Returns (level, levelVar) per observation. The IEEE operation order
    * is pinned — the q134 DuckDB recursive-CTE oracle replays it
    * verbatim, so do not re-associate these expressions. With q = 0 the
    * filter degenerates to the running mean (KalmanSpec pins this). */
  def levelFilter(y: Array[Double], q: Double, r: Double): Array[(Double, Double)] = {
    val out = new Array[(Double, Double)](y.length)
    if (y.isEmpty) return out
    var a = y(0)
    var p = r
    out(0) = (a, p)
    var t = 1
    while (t < y.length) {
      val pp = p + q
      val k = pp / (pp + r)
      a = a + k * (y(t) - a)
      p = (1.0 - k) * pp
      out(t) = (a, p)
      t += 1
    }
    out
  }
}
