package graft.forecast

/** RiskMetrics EWMA volatility — the reference's GARCH fallback path
  * (/root/reference/forcester_ts/garch.py:580-633, λ=0.94 per
  * config/pipeline_config.yml garch.ewma_lambda).
  *
  * σ²_t = λ·σ²_{t−1} + (1−λ)·r²_t, seeded with σ²_1 = r²_1.
  * A sequential recurrence — runs inside a per-ticker kernel
  * (groupByKey.mapGroups), never as a driver loop.
  */
object Ewma {

  def variancePath(returns: Array[Double], lambda: Double = 0.94): Array[Double] = {
    require(lambda > 0 && lambda < 1, s"lambda out of (0,1): $lambda")
    if (returns.isEmpty) Array.empty
    else {
      val out = new Array[Double](returns.length)
      out(0) = returns(0) * returns(0)
      var i = 1
      while (i < returns.length) {
        out(i) = lambda * out(i - 1) + (1 - lambda) * returns(i) * returns(i)
        i += 1
      }
      out
    }
  }

  /** h-step vol forecast: EWMA variance is a martingale ⇒ flat path at
    * the last filtered variance. */
  def forecastVol(returns: Array[Double], horizon: Int, lambda: Double = 0.94): Array[Double] = {
    val path = variancePath(returns, lambda)
    val last = if (path.isEmpty) 0.0 else path.last
    Array.fill(horizon)(math.sqrt(last))
  }
}
