package graft.forecast

/** Market regime detection — rebuild of /root/reference/forcester_ts/
  * regime_detector.py:30-310: realized vol (annualized √252), vol-of-vol,
  * trend strength (linear-regression R², :115-143), Hurst exponent via
  * power-law fit of lag-diff std (:144-187), skew/kurt, and the rule-tree
  * classification into regimes with model recommendations (:202-310).
  */
object RegimeDetector {

  final case class Features(realizedVol: Double, volOfVol: Double,
      trendR2: Double, trendSlope: Double, hurst: Double,
      skew: Double, kurtosis: Double)

  final case class Result(regime: String, confidence: Double,
      features: Features, recommendedModels: Seq[String])

  private def mean(a: Array[Double]) = if (a.isEmpty) 0.0 else a.sum / a.length

  private def std(a: Array[Double]): Double = {
    if (a.length < 2) return 0.0
    val m = mean(a)
    math.sqrt(a.map(x => (x - m) * (x - m)).sum / (a.length - 1))
  }

  /** OLS of y on t=0..n-1 → (slope, r²). */
  def trend(y: Array[Double]): (Double, Double) = {
    val n = y.length
    if (n < 3) return (0.0, 0.0)
    val t = Array.tabulate(n)(_.toDouble)
    val mt = mean(t); val my = mean(y)
    val sxy = t.zip(y).map { case (a, b) => (a - mt) * (b - my) }.sum
    val sxx = t.map(a => (a - mt) * (a - mt)).sum
    val syy = y.map(b => (b - my) * (b - my)).sum
    if (sxx == 0 || syy == 0) (0.0, 0.0)
    else {
      val slope = sxy / sxx
      (slope, sxy * sxy / (sxx * syy))
    }
  }

  /** Hurst exponent: slope of log std(x_{t+τ}−x_t) vs log τ
    * (the reference's power-law variant, regime_detector.py:144-187). */
  def hurst(x: Array[Double], maxLag: Int = 20): Double = {
    if (x.length < maxLag * 2) return 0.5
    val lags = (2 to maxLag).toArray
    val logLag = lags.map(l => math.log(l.toDouble))
    val logSd = lags.map { l =>
      val diffs = (l until x.length).map(i => x(i) - x(i - l)).toArray
      math.log(math.max(std(diffs), 1e-12))
    }
    trend2(logLag, logSd)
  }

  private def trend2(x: Array[Double], y: Array[Double]): Double = {
    val mx = mean(x); val my = mean(y)
    val sxy = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
    val sxx = x.map(a => (a - mx) * (a - mx)).sum
    if (sxx == 0) 0.5 else sxy / sxx
  }

  def features(prices: Array[Double], window: Int = 60): Features = {
    val rets = prices.sliding(2).map(a => a(1) / a(0) - 1).toArray
    val recent = rets.takeRight(window)
    val rv = std(recent) * math.sqrt(252.0)
    // vol-of-vol: std of rolling-10 vols over the window
    val rollVols = recent.sliding(10).map(std).toArray
    val vov = std(rollVols)
    val (slope, r2) = trend(prices.takeRight(window))
    val h = hurst(prices)
    val m = mean(recent); val sd = math.max(std(recent), 1e-12)
    // explicit products, not libm pow: (z·z)·z and (z·z)·(z·z) are
    // specified IEEE op sequences an external oracle replays exactly
    val sk = mean(recent.map { r => val z = (r - m) / sd; (z * z) * z })
    val ku = mean(recent.map { r => val z = (r - m) / sd; (z * z) * (z * z) })
    Features(rv, vov, r2, slope, h, sk, ku)
  }

  /** Rule tree (shape of regime_detector.py:202-245). */
  def detect(prices: Array[Double], window: Int = 60): Result = {
    val f = features(prices, window)
    val (regime, conf, models) =
      if (f.realizedVol > 0.45 && f.kurtosis > 5) ("CRISIS", 0.9,
        Seq("GARCH", "MSSA_RL"))
      else if (f.realizedVol > 0.30) ("HIGH_VOLATILITY", 0.8,
        Seq("GARCH", "SAMOSSA"))
      else if (f.trendR2 > 0.6 && f.hurst > 0.55) ("STRONG_TRENDING", 0.85,
        Seq("SARIMAX", "SAMOSSA"))
      else if (f.trendR2 > 0.3) ("MODERATE_TRENDING", 0.7,
        Seq("SARIMAX", "ENSEMBLE"))
      else if (f.hurst < 0.45) ("MEAN_REVERTING", 0.7,
        Seq("SAMOSSA", "SARIMAX"))
      else ("RANGING", 0.6, Seq("ENSEMBLE"))
    Result(regime, conf, f, models)
  }
}
