package graft.stats

/** Statistical test operators — rebuilds of /root/reference/etl/
  * statistical_tests.py and forcester_ts/var_backtest.py:
  *  - Diebold–Mariano with Newey–West HAC variance (:34-111)
  *  - Ljung–Box autocorrelation test (:193-250)
  *  - bootstrap CI by seeded resampling (:251-293)
  *  - rank stability across folds (:112-174)
  *  - ADF-lite unit-root t-stat (time_series_analyzer.py:338-438)
  *  - Christoffersen independence test (var_backtest.py:141-236)
  *
  * CDFs (Student-t via regularized incomplete beta, χ² via regularized
  * lower gamma) are implemented from the standard continued-fraction /
  * series expansions so p-values need no external library.
  */
object StatTests {

  // ---------- special functions ----------

  private def logGamma(x: Double): Double = {
    // Lanczos approximation
    val g = 7.0
    val c = Array(0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1 - x)
    else {
      val z = x - 1
      var a = c(0)
      (1 until 9).foreach(i => a += c(i) / (z + i))
      val t = z + g + 0.5
      0.5 * math.log(2 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized incomplete beta I_x(a,b) via Lentz continued fraction. */
  def incBeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0) return 0.0
    if (x >= 1) return 1.0
    val lbeta = logGamma(a) + logGamma(b) - logGamma(a + b)
    val front = math.exp(math.log(x) * a + math.log(1 - x) * b - lbeta) / a
    // Lentz's algorithm
    val eps = 1e-15
    var f = 1.0; var c = 1.0; var d = 0.0
    var i = 0
    while (i <= 300) {
      val m = i / 2
      val numerator =
        if (i == 0) 1.0
        else if (i % 2 == 0) m * (b - m) * x / ((a + 2 * m - 1) * (a + 2 * m))
        else -(a + m) * (a + b + m) * x / ((a + 2 * m) * (a + 2 * m + 1))
      d = 1.0 + numerator * d
      if (math.abs(d) < 1e-30) d = 1e-30
      d = 1.0 / d
      c = 1.0 + numerator / c
      if (math.abs(c) < 1e-30) c = 1e-30
      f *= c * d
      if (math.abs(1.0 - c * d) < eps) return math.min(1.0, math.max(0.0, front * (f - 1.0)))
      i += 1
    }
    math.min(1.0, math.max(0.0, front * (f - 1.0)))
  }

  /** Regularized lower incomplete gamma P(a, x). */
  def regGammaP(a: Double, x: Double): Double = {
    if (x <= 0) return 0.0
    if (x < a + 1) { // series
      var sum = 1.0 / a; var term = sum; var n = 1
      while (n < 300 && math.abs(term) > 1e-16 * math.abs(sum)) {
        term *= x / (a + n); sum += term; n += 1
      }
      sum * math.exp(-x + a * math.log(x) - logGamma(a))
    } else { // continued fraction for Q, then 1-Q
      var b0 = x + 1 - a; var c = 1e300; var d = 1 / b0; var h = d
      var i = 1
      while (i < 300) {
        val an = -i * (i - a)
        b0 += 2
        d = an * d + b0; if (math.abs(d) < 1e-30) d = 1e-30
        c = b0 + an / c; if (math.abs(c) < 1e-30) c = 1e-30
        d = 1 / d
        val del = d * c
        h *= del
        if (math.abs(del - 1.0) < 1e-15) i = 300
        i += 1
      }
      1.0 - math.exp(-x + a * math.log(x) - logGamma(a)) * h
    }
  }

  /** Two-sided Student-t p-value. */
  def tPValue(t: Double, df: Double): Double =
    incBeta(df / 2, 0.5, df / (df + t * t))

  /** Upper-tail χ² p-value. */
  def chi2PValue(x: Double, df: Double): Double =
    1.0 - regGammaP(df / 2, x / 2)

  // ---------- tests ----------

  final case class TestResult(statistic: Double, pValue: Double)

  /** Diebold–Mariano: loss differential d_t = e1²−e2², HAC (Newey–West)
    * variance with `lags` Bartlett-weighted autocovariances. Negative
    * statistic ⇒ model 1 better. */
  def dieboldMariano(err1: Array[Double], err2: Array[Double], lags: Int = 4): TestResult = {
    require(err1.length == err2.length && err1.length > lags + 2)
    val d = err1.zip(err2).map { case (a, b) => a * a - b * b }
    val n = d.length
    val mean = d.sum / n
    def gamma(k: Int): Double =
      (k until n).map(i => (d(i) - mean) * (d(i - k) - mean)).sum / n
    val nwVar = gamma(0) + 2.0 * (1 to lags).map(k =>
      (1.0 - k.toDouble / (lags + 1)) * gamma(k)).sum
    val stat = mean / math.sqrt(math.max(nwVar, 1e-300) / n)
    TestResult(stat, tPValue(stat, n - 1.0))
  }

  /** Ljung–Box Q statistic over the first `lags` autocorrelations. */
  def ljungBox(x: Array[Double], lags: Int = 10): TestResult = {
    val n = x.length
    val mean = x.sum / n
    val denom = x.map(v => (v - mean) * (v - mean)).sum
    val q = n * (n + 2.0) * (1 to lags).map { k =>
      val rk = (k until n).map(i => (x(i) - mean) * (x(i - k) - mean)).sum / denom
      rk * rk / (n - k)
    }.sum
    TestResult(q, chi2PValue(q, lags.toDouble))
  }

  /** ADF-lite: t-stat of ρ in Δx_t = α + ρ·x_{t−1} + ε (no lag terms).
    * Strongly negative ⇒ stationary. */
  def adfLite(x: Array[Double]): TestResult = {
    val n = x.length - 1
    val dx = (1 to n).map(i => x(i) - x(i - 1)).toArray
    val xl = x.take(n)
    val mx = xl.sum / n; val md = dx.sum / n
    val sxx = xl.map(v => (v - mx) * (v - mx)).sum
    val sxy = xl.zip(dx).map { case (a, b) => (a - mx) * (b - md) }.sum
    val rho = sxy / sxx
    val alpha = md - rho * mx
    val resid = xl.zip(dx).map { case (a, b) => b - alpha - rho * a }
    val s2 = resid.map(r => r * r).sum / (n - 2)
    val se = math.sqrt(s2 / sxx)
    val t = rho / se
    TestResult(t, tPValue(t, n - 2.0)) // NOTE: DF distribution ≠ t; heuristic gate
  }

  /** Christoffersen independence test on a 0/1 violation sequence. */
  def christoffersen(viol: Array[Int]): TestResult = {
    var n00 = 0; var n01 = 0; var n10 = 0; var n11 = 0
    (1 until viol.length).foreach { i =>
      (viol(i - 1), viol(i)) match {
        case (0, 0) => n00 += 1
        case (0, 1) => n01 += 1
        case (1, 0) => n10 += 1
        case (1, 1) => n11 += 1
      }
    }
    val p01 = if (n00 + n01 > 0) n01.toDouble / (n00 + n01) else 0.0
    val p11 = if (n10 + n11 > 0) n11.toDouble / (n10 + n11) else 0.0
    val p = (n01 + n11).toDouble / math.max(1, n00 + n01 + n10 + n11)
    def ll(k: Int, n: Int, pi: Double): Double =
      if (n == 0 || pi <= 0 || pi >= 1) 0.0
      else (n - k) * math.log(1 - pi) + k * math.log(pi)
    val lr = -2.0 * (ll(n01 + n11, n00 + n01 + n10 + n11, p) -
      (ll(n01, n00 + n01, p01) + ll(n11, n10 + n11, p11)))
    TestResult(lr, chi2PValue(math.max(lr, 0.0), 1.0))
  }

  /** Seeded bootstrap CI of the mean (etl/portfolio_math.py:388-431,
    * etl/statistical_tests.py:251-293).
    *
    * The resampling stream is an explicit 31-bit LCG (glibc constants,
    * s ← (1103515245·s + 12345) mod 2³¹, index = s mod n) rather than
    * java.util.Random: every product fits a signed 64-bit integer, so an
    * external SQL oracle replays the identical draw sequence with plain
    * BIGINT arithmetic — no 48-bit hidden state, no rejection loops. */
  def bootstrapCI(x: Array[Double], nBoot: Int = 1000, alpha: Double = 0.05,
      seed: Long = 42L): (Double, Double) = {
    val n = x.length
    // floorMod: Java % preserves sign, so a negative seed would produce a
    // negative state and a negative array index below. floorMod keeps the
    // state (and thus s % n) in [0, 2^31) for any Long seed.
    var s = java.lang.Math.floorMod(seed, 2147483648L)
    val means = Array.fill(nBoot) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        s = (1103515245L * s + 12345L) % 2147483648L
        acc += x((s % n).toInt)
        i += 1
      }
      acc / n
    }.sorted
    (means(math.max(0, (alpha / 2 * nBoot).toInt)),
      means(math.min(nBoot - 1, ((1 - alpha / 2) * nBoot).toInt)))
  }

  /** Mean rank of each model across folds (lower = better, stable). */
  def rankStability(scoresByFold: Seq[Map[String, Double]]): Map[String, Double] = {
    val ranks = scoresByFold.map { fold =>
      fold.toSeq.sortBy(-_._2).zipWithIndex.map { case ((m, _), i) => m -> (i + 1.0) }.toMap
    }
    ranks.flatten.groupBy(_._1).map { case (m, rs) => m -> rs.map(_._2).sum / rs.size }
  }
}
