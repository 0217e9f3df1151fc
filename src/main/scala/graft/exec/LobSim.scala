package graft.exec

/** Limit-order-book market-order fill simulator — rebuild of
  * /root/reference/execution/lob_simulator.py:51-170: a synthetic book
  * with `levels` price levels spaced `tickSizeBps` apart, depth
  * distributed across levels by an exponential decay e^(−α·i), the
  * aggressor walking the book from mid ± (half-spread + baseline
  * slippage) and paying a deep-tail penalty price when the visible book
  * is exhausted. Deterministic pure function — usable inside per-ticker
  * kernels and the signal friction estimator alike.
  */
object LobSim {

  final case class Config(
      levels: Int = 10,
      tickSizeBps: Double = 1.0,
      alpha: Double = 0.8,
      maxExhaustLevels: Int = 25,
      tailDepthMultiplier: Double = 1.0)

  /** `vwapPrice` is the size-weighted fill price; `exhausted` means the
    * visible depth could not absorb the order and the tail penalty
    * applied (lob_simulator.py:152-158). */
  final case class Fill(
      requestedShares: Double,
      vwapPrice: Double,
      midPrice: Double,
      startPrice: Double,
      levelsConsumed: Int,
      exhausted: Boolean) {
    def midSlippageBps: Double =
      if (midPrice <= 0) 0.0 else (vwapPrice - midPrice) / midPrice * 1e4
  }

  /** Walk the synthetic book for a market order. `buy` = aggressor side;
    * `depthNotional` ≤ 0 degenerates to a single exhausted fill at the
    * start price (the reference's no-depth contract, :118-127). */
  def marketOrderFill(
      buy: Boolean,
      midPrice: Double,
      shares: Double,
      halfSpread: Double = 0.0,
      depthNotional: Double = 0.0,
      baselineSlippage: Double = 0.0,
      cfg: Config = Config()): Fill = {
    val mid = midPrice
    if (mid <= 0 || shares <= 0)
      return Fill(math.max(0.0, shares), mid, mid, mid, 0, exhausted = false)

    val levels = math.max(1, cfg.levels)
    val alpha = math.max(0.0, cfg.alpha)
    val tick0 = mid * math.max(0.0, cfg.tickSizeBps) / 1e4
    val tick = if (tick0 <= 0) math.max(1e-9, mid * 1e-4) else tick0
    val hs = math.abs(halfSpread)
    val base = math.abs(baselineSlippage)
    val startPrice = math.max(if (buy) mid + hs + base else mid - hs - base, tick)

    if (depthNotional <= 0)
      return Fill(shares, startPrice, mid, startPrice, 1, exhausted = true)

    val weights = Array.tabulate(levels)(i => math.exp(-alpha * i))
    val weightSum = weights.sum // levels >= 1 and e^x > 0 ⇒ sum > 0
    var remaining = shares
    var totalCost = 0.0
    var consumed = 0
    var i = 0
    while (i < levels && remaining > 0) {
      val px =
        if (buy) startPrice + i * tick
        else math.max(tick, startPrice - i * tick)
      val sharesHere = depthNotional * (weights(i) / weightSum) / px
      if (sharesHere > 0) {
        val fill = math.min(remaining, sharesHere)
        remaining -= fill
        totalCost += fill * px
        if (fill > 0) consumed = i + 1
      }
      i += 1
    }
    val exhausted = remaining > 0
    if (exhausted) {
      // deep-tail penalty: whatever the visible book could not absorb
      // fills maxExhaustLevels·tailMult ticks away (:152-158)
      val tailLevels = math.max(levels,
        (cfg.maxExhaustLevels * math.max(1.0, cfg.tailDepthMultiplier)).toInt)
      val px =
        if (buy) startPrice + tailLevels * tick
        else math.max(tick, startPrice - tailLevels * tick)
      totalCost += remaining * px
      consumed = math.max(consumed, levels)
    }
    Fill(shares, totalCost / shares, mid, startPrice, consumed, exhausted)
  }
}
