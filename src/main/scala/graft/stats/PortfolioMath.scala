package graft.stats

import breeze.linalg.{DenseMatrix, DenseVector}

/** Portfolio mathematics — rebuild of /root/reference/etl/portfolio_math.py:
  * Sharpe/Sortino/max drawdown (:69-238, :432-452), omega ratio (:540-851),
  * fat-tail Kelly (:249-265, :1033-1082), covariance with Ledoit-Wolf-style
  * shrinkage (:239-311), Markowitz min-variance and risk-parity weights
  * (:312-387), expected-shortfall-to-edge (:852-1032), Shapley attribution
  * of ensemble components (forcester_ts/shapley_attribution.py:37-232).
  *
  * Asset counts are tiny (the reference optimizes over a handful of
  * tickers), so the optimizers are deterministic driver/kernel-side
  * Breeze routines; the DATA-side inputs (returns, covariance) come from
  * distributed aggregations.
  */
object PortfolioMath {

  def sharpe(returns: Array[Double], periodsPerYear: Double = 252.0): Double = {
    val m = returns.sum / returns.length
    val sd = stddev(returns)
    if (sd == 0) 0.0 else m / sd * math.sqrt(periodsPerYear)
  }

  def sortino(returns: Array[Double], periodsPerYear: Double = 252.0): Double = {
    val m = returns.sum / returns.length
    val downside = returns.map(r => if (r < 0) r else 0.0)
    val dd = stddev(downside)
    if (dd == 0) 0.0 else m / dd * math.sqrt(periodsPerYear)
  }

  def maxDrawdown(returns: Array[Double]): Double = {
    var cum = 1.0; var peak = 1.0; var mdd = 0.0
    returns.foreach { r =>
      cum *= (1 + r)
      peak = math.max(peak, cum)
      mdd = math.max(mdd, 1 - cum / peak)
    }
    mdd
  }

  def omega(returns: Array[Double], hurdle: Double = 0.0): Double = {
    val up = returns.map(r => math.max(r - hurdle, 0.0)).sum
    val down = returns.map(r => math.max(hurdle - r, 0.0)).sum
    if (down == 0) Double.PositiveInfinity else up / down
  }

  /** Fat-tail fractional Kelly with kurtosis dampener, capped at 0.20. */
  def kelly(returns: Array[Double], riskFree: Double = 0.0,
      fraction: Double = 0.5, cap: Double = 0.20): Double = {
    val n = returns.length
    val m = returns.sum / n
    val v = returns.map(r => (r - m) * (r - m)).sum / n
    if (v == 0) return 0.0
    val m4 = returns.map(r => math.pow(r - m, 4)).sum / n
    val kurt = m4 / (v * v)
    val damp = 1.0 / (1.0 + math.max(kurt - 3.0, 0.0) / 4.0)
    math.min(cap, math.max(0.0, (m - riskFree) / v * damp * fraction))
  }

  /** Pinball (quantile) loss of a quantile forecast
    * (forcester_ts/var_backtest.py pinball section). */
  def pinballLoss(actual: Array[Double], predictedQuantile: Array[Double],
      tau: Double): Double = {
    require(actual.length == predictedQuantile.length && actual.nonEmpty)
    actual.zip(predictedQuantile).map { case (y, q) =>
      if (y >= q) tau * (y - q) else (1 - tau) * (q - y)
    }.sum / actual.length
  }

  /** NGN effective return: USD return adjusted for FX drift and P2P
    * conversion friction (etl/portfolio_math.py:1083-1191). */
  def ngnEffectiveReturn(usdReturn: Double, fxDriftAnnual: Double,
      p2pFrictionBps: Double, holdingDays: Double): Double = {
    val fx = math.pow(1 + fxDriftAnnual, holdingDays / 365.0) - 1
    (1 + usdReturn) * (1 + fx) * (1 - p2pFrictionBps / 1e4) - 1
  }

  def expectedShortfall(returns: Array[Double], alpha: Double = 0.05): Double = {
    val sorted = returns.sorted
    val k = math.max(1, (alpha * sorted.length).toInt)
    -sorted.take(k).sum / k
  }

  /** Expected-shortfall-to-edge ratio (portfolio_math.py:852-1032): how
    * many units of tail loss are carried per unit of expected edge —
    * Infinity when there is no positive edge (the reference's "reject
    * the strategy" sentinel). */
  def esToEdge(returns: Array[Double], riskFree: Double = 0.0,
      alpha: Double = 0.05): Double = {
    if (returns.isEmpty) return Double.PositiveInfinity
    val edge = returns.map(_ - riskFree).sum / returns.length
    if (edge <= 0) Double.PositiveInfinity
    else expectedShortfall(returns, alpha) / edge
  }

  /** Payoff asymmetry (tail-means ratio): mean winning return over the
    * magnitude of the mean losing return; Infinity with no losses, 0
    * with no wins. The reference reports 2.65x (README.md:164). */
  def payoffAsymmetry(returns: Array[Double]): Double = {
    val wins = returns.filter(_ > 0)
    val losses = returns.filter(_ < 0)
    if (wins.isEmpty) 0.0
    else if (losses.isEmpty) Double.PositiveInfinity
    else (wins.sum / wins.length) / math.abs(losses.sum / losses.length)
  }

  private def stddev(a: Array[Double]): Double = {
    if (a.length < 2) return 0.0
    val m = a.sum / a.length
    math.sqrt(a.map(x => (x - m) * (x - m)).sum / (a.length - 1))
  }

  /** Sample covariance matrix of column-wise return series. */
  def covariance(returns: DenseMatrix[Double]): DenseMatrix[Double] = {
    val n = returns.rows
    val means = DenseVector.tabulate(returns.cols)(j =>
      breeze.linalg.sum(returns(::, j)) / n)
    val centered = DenseMatrix.tabulate(n, returns.cols)((i, j) =>
      returns(i, j) - means(j))
    (centered.t * centered) / (n - 1).toDouble
  }

  /** Ledoit-Wolf-style shrinkage toward the scaled identity:
    * Σ' = (1−δ)Σ + δ·avgVar·I. */
  def shrink(cov: DenseMatrix[Double], delta: Double): DenseMatrix[Double] = {
    require(delta >= 0 && delta <= 1)
    val avgVar = breeze.linalg.trace(cov) / cov.rows
    DenseMatrix.tabulate(cov.rows, cov.cols)((i, j) =>
      (1 - delta) * cov(i, j) + (if (i == j) delta * avgVar else 0.0))
  }

  /** Optimal Ledoit-Wolf shrinkage intensity (Ledoit & Wolf 2004, "A
    * well-conditioned estimator for large-dimensional covariance
    * matrices") — the estimator the reference delegates to sklearn's
    * `LedoitWolf` (portfolio_math.py:267-306). Rows of `returns` are
    * observations, columns assets. Uses the /n (biased) sample
    * covariance like sklearn, and the X²ᵀX² row-sum identity so the
    * sufficient statistics are one pass over rows:
    * δ* = min(b̄², d²)/d² with
    *   μ  = tr(S)/p,  d² = ‖S − μI‖²_F/p,
    *   b̄² = (Σ_k r_k²/n − ‖S‖²_F)/(n·p),  r_k = Σ_i xc²_ki.
    */
  def ledoitWolfDelta(returns: DenseMatrix[Double]): Double = {
    val n = returns.rows
    val p = returns.cols
    if (n < 2) return 1.0
    val means = DenseVector.tabulate(p)(j => breeze.linalg.sum(returns(::, j)) / n)
    val xc = DenseMatrix.tabulate(n, p)((i, j) => returns(i, j) - means(j))
    val s = (xc.t * xc) / n.toDouble
    val mu = breeze.linalg.trace(s) / p
    var sumS2 = 0.0
    var i = 0
    while (i < p) {
      var j = 0
      while (j < p) { sumS2 += s(i, j) * s(i, j); j += 1 }
      i += 1
    }
    val d2 = (sumS2 - 2.0 * mu * breeze.linalg.trace(s) + p * mu * mu) / p
    if (d2 <= 0) return 0.0
    var q = 0.0 // Σ_k (row sum of squares)²
    var k = 0
    while (k < n) {
      var r = 0.0
      var j = 0
      while (j < p) { r += xc(k, j) * xc(k, j); j += 1 }
      q += r * r
      k += 1
    }
    val b2bar = (q / n - sumS2) / (n.toDouble * p)
    val b2 = math.min(b2bar, d2)
    math.max(0.0, math.min(1.0, b2 / d2))
  }

  /** Ledoit-Wolf estimator: (1−δ*)·S_n + δ*·μ·I on the /n sample
    * covariance, δ* from [[ledoitWolfDelta]]. */
  def ledoitWolf(returns: DenseMatrix[Double]): DenseMatrix[Double] = {
    val n = returns.rows
    val p = returns.cols
    val means = DenseVector.tabulate(p)(j => breeze.linalg.sum(returns(::, j)) / n)
    val xc = DenseMatrix.tabulate(n, p)((i, j) => returns(i, j) - means(j))
    val s = (xc.t * xc) / n.toDouble
    val mu = breeze.linalg.trace(s) / p
    val d = ledoitWolfDelta(returns)
    DenseMatrix.tabulate(p, p)((i, j) =>
      (1 - d) * s(i, j) + (if (i == j) d * mu else 0.0))
  }

  /** Minimum-variance long-only weights via deterministic projected
    * gradient descent on the simplex (the SLSQP stand-in).
    *
    * Explicit ascending-j dot products (no breeze gemv) so the IEEE op
    * sequence is specified and an external oracle can replay every
    * iteration bit-for-bit (the Ssa.mm rationale). */
  def minVarianceWeights(cov: DenseMatrix[Double], iters: Int = 2000,
      lr: Double = 0.1): Array[Double] = {
    val k = cov.rows
    var w = Array.fill(k)(1.0 / k)
    var it = 0
    while (it < iters) {
      val v = new Array[Double](k)
      var i = 0
      while (i < k) {
        var dot = 0.0
        var j = 0
        while (j < k) { dot += cov(i, j) * w(j); j += 1 }
        v(i) = w(i) - (dot * 2.0) * lr
        i += 1
      }
      w = projectSimplex(v)
      it += 1
    }
    w
  }

  /** Risk parity: iterative proportional update until each asset's risk
    * contribution w_i·(Σw)_i equalizes. Damping exponent is 1/4 computed
    * as sqrt(sqrt(x)): sqrt is IEEE-exact in every engine, where a
    * libm pow(x, 0.2) is not — keeps the whole recursion replayable. */
  def riskParityWeights(cov: DenseMatrix[Double], iters: Int = 500): Array[Double] = {
    val k = cov.rows
    var w = Array.fill(k)(1.0 / k)
    var it = 0
    while (it < iters) {
      val rc = new Array[Double](k)
      var sumRc = 0.0
      var i = 0
      while (i < k) {
        var dot = 0.0
        var j = 0
        while (j < k) { dot += cov(i, j) * w(j); j += 1 }
        rc(i) = w(i) * dot
        sumRc += rc(i)
        i += 1
      }
      val target = sumRc / k
      var sumW = 0.0
      i = 0
      while (i < k) {
        w(i) = w(i) * math.sqrt(math.sqrt(target / math.max(rc(i), 1e-12)))
        sumW += w(i)
        i += 1
      }
      i = 0
      while (i < k) { w(i) = w(i) / sumW; i += 1 }
      it += 1
    }
    w
  }

  private def projectSimplex(v: Array[Double]): Array[Double] = {
    // Euclidean projection onto {w : w_i >= 0, Σw = 1}
    val u = v.sorted(Ordering[Double].reverse)
    val css = u.scanLeft(0.0)(_ + _).drop(1)
    val rho = (0 until u.length).reverse
      .find(i => u(i) + (1.0 - css(i)) / (i + 1) > 0).getOrElse(0)
    val theta = (1.0 - css(rho)) / (rho + 1)
    v.map(x => math.max(0.0, x + theta))
  }

  /** Shapley attribution of a coalition value function over model
    * subsets (≤ a handful of models ⇒ exact enumeration). */
  def shapley(models: Seq[String], value: Set[String] => Double): Map[String, Double] = {
    val n = models.size
    def fact(k: Int): Double = (1 to k).product.toDouble.max(1.0)
    models.map { m =>
      val others = models.filterNot(_ == m)
      val contrib = others.toSet.subsets().map { s =>
        val weight = fact(s.size) * fact(n - s.size - 1) / fact(n)
        weight * (value(s + m) - value(s))
      }.sum
      m -> contrib
    }.toMap
  }

  /** Closed-form-iterated Platt scaling: fit σ(a·x + b) to (score, label)
    * pairs by Newton's method (models/time_series_signal_generator.py:
    * 3724-4069 confidence calibration). */
  def plattFit(scores: Array[Double], labels: Array[Int], iters: Int = 100)
      : (Double, Double) = {
    var a = 1.0; var b = 0.0
    (0 until iters).foreach { _ =>
      var ga = 0.0; var gb = 0.0; var haa = 0.0; var hab = 0.0; var hbb = 0.0
      scores.zip(labels).foreach { case (x, y) =>
        val p = 1.0 / (1.0 + math.exp(-(a * x + b)))
        val d = p - y
        ga += d * x; gb += d
        val w = p * (1 - p)
        haa += w * x * x; hab += w * x; hbb += w
      }
      val det = haa * hbb - hab * hab
      if (math.abs(det) > 1e-12) {
        a -= (hbb * ga - hab * gb) / det
        b -= (haa * gb - hab * ga) / det
      }
    }
    (a, b)
  }

  def plattApply(a: Double, b: Double)(x: Double): Double =
    1.0 / (1.0 + math.exp(-(a * x + b)))

  /** Bucket roll-up for a weight vector: left-to-right sums of the
    * weights whose bucket matches, in input order — the float op order
    * is part of the contract (the q212 oracle replays it term by term).
    * Rebuild of /root/reference/risk/barbell_policy.py:104-121
    * bucket_weights (safe/core/spec/other). */
  def barbellBucketSum(w: Array[Double], buckets: Array[String],
      bucket: String): Double = {
    var s = 0.0
    var i = 0
    while (i < w.length) {
      if (buckets(i) == bucket) s += w(i)
      i += 1
    }
    s
  }

  /** Projection of a raw weight vector into the barbell-feasible region —
    * rebuild of /root/reference/risk/barbell_policy.py:123-189
    * project_to_feasible, op-for-op:
    *   1. risk cap: if core+spec > riskMax, scale core∪spec by
    *      riskMax/max(risk, 1e-12), then recompute buckets;
    *   2. per-bucket caps: core > coreMax > 0 and spec > specMax > 0
    *      each scale only their own bucket (spec's base is the
    *      post-risk-cap spec, unchanged by the core cap);
    *   3. safe floor: if safe < safeMin, take the deficit
    *      proportionally from every non-safe symbol (factor
    *      max(0, 1 − deficit/(total − safe))), then boost the safe
    *      symbols by 1 + deficit/safe_current when safe_current > 0;
    *   4. renormalize to the ORIGINAL total iff the sum moved.
    * All sums are left-to-right in input order; scales multiply only
    * when their branch fires (mirrored as ×1.0 otherwise — exact).
    * Asset counts are tiny (a handful of buckets per portfolio), so
    * this is a per-group kernel; the distributed work is producing the
    * weight vectors, one per portfolio, upstream. */
  def barbellProject(w0: Array[Double], buckets: Array[String],
      riskMax: Double, coreMax: Double, specMax: Double,
      safeMin: Double): Array[Double] = {
    val w = w0.clone()
    def bsum(b: String): Double = barbellBucketSum(w, buckets, b)
    def scaleWhere(p: Int => Boolean, scale: Double): Unit = {
      var i = 0
      while (i < w.length) { if (p(i)) w(i) *= scale; i += 1 }
    }
    def totalOf(): Double = {
      var s = 0.0; var i = 0
      while (i < w.length) { s += w(i); i += 1 }
      s
    }
    val totalRaw = totalOf()
    val total = if (totalRaw == 0.0) 1.0 else totalRaw

    var core = bsum("core")
    var spec = bsum("spec")
    val risk = core + spec
    if (risk > riskMax) {
      val scale = riskMax / math.max(risk, 1e-12)
      scaleWhere(i => buckets(i) == "core" || buckets(i) == "spec", scale)
      core = bsum("core")
      spec = bsum("spec")
    }
    if (core > coreMax && coreMax > 0)
      scaleWhere(i => buckets(i) == "core", coreMax / math.max(core, 1e-12))
    if (spec > specMax && specMax > 0)
      scaleWhere(i => buckets(i) == "spec", specMax / math.max(spec, 1e-12))

    val safe = bsum("safe")
    if (safe < safeMin) {
      val deficit = safeMin - safe
      val donorTotal = total - safe
      if (donorTotal > 0) {
        val frac = deficit / donorTotal
        scaleWhere(i => buckets(i) != "safe", math.max(0.0, 1.0 - frac))
        val safeCurrent = bsum("safe")
        if (safeCurrent > 0)
          scaleWhere(i => buckets(i) == "safe", 1.0 + deficit / safeCurrent)
      }
    }

    val newTotalRaw = totalOf()
    val newTotal = if (newTotalRaw == 0.0) 1.0 else newTotalRaw
    if (newTotal != total) scaleWhere(_ => true, total / newTotal)
    w
  }
}
