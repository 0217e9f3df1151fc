package graft.signals

import graft.domain.Signal

/** Per-ticker signal generation — rebuild of the decision core of
  * /root/reference/models/time_series_signal_generator.py:176-4289:
  *  - round-trip friction ESTIMATOR with the reference's preference
  *    ladder (:1313-1451): microstructure columns (TxnCostBps+ImpactBps,
  *    doubled for the round trip) → bid/ask spread (floored at the
  *    asset-class default) → asset-class default bps; the LOB walk is
  *    subsumed by the microstructure arm (its depth/impact inputs are
  *    the same columns);
  *  - net-return semantics (:722-725): net trade return =
  *    max(0, |gross| − roundtrip), and the ACTION thresholds gate the
  *    net, not the gross;
  *  - CI-implied signal-to-noise GATE (:1452-1532, :778-835): snr =
  *    |expected return| / (CI half-width / z / price), thresholded at
  *    minSnr adjusted by √(horizon/5) (the Fix-D horizon scaling); a
  *    failing gate zeroes the net return and stamps the SNR_GATE hold
  *    reason;
  *  - the weighted confidence core 0.2·diag + 0.2·agreement + 0.2·snr +
  *    0.4·edge with volatility damping and the Platt hook (:1587-1680);
  *  - the action rule with the reference's structured hold-reason
  *    taxonomy (:1981-2017, :1026-1032): CONFIDENCE_BELOW_THRESHOLD,
  *    SNR_GATE, MIN_RETURN, RISK_TOO_HIGH, ZERO_EXPECTED_RETURN —
  *    checked in that order;
  *  - ATR stop/target with R:R ≥ 2 enforcement (:2049-2102).
  *
  * Pure scalar math over one ticker's forecast payload — runs inside the
  * per-ticker kernel; Spark parallelizes across tickers.
  */
object SignalGenerator {

  final case class Config(
      minExpectedReturn: Double = 0.01, // on the NET return (one-sided)
      minConfidence: Double = 0.45,
      maxRisk: Double = 0.75,
      atrStopMult: Double = 2.0,
      minRiskReward: Double = 2.0,
      // SNR gate: base threshold calibrated at the 5-bar reference
      // horizon; effective threshold = minSnr / sqrt(max(h,5)/5)
      minSnr: Double = 1.5,
      snrZ: Double = 1.96,
      // asset-class default round-trip cost in bps — the ladder's floor
      // (reference _default_roundtrip_cost_bps)
      defaultRoundtripBps: Map[String, Double] =
        Map("EQUITY" -> 10.0, "FX" -> 4.0, "CRYPTO" -> 20.0, "UNKNOWN" -> 10.0),
      // Confidence calibrator applied to the raw damped core — plug
      // PortfolioMath.plattApply(a, b) fitted on realized outcomes for
      // the reference's Platt-calibrated confidence (:3724-4069)
      calibrate: Double => Double = identity)

  /** `bid`/`ask`/`txnCostBps`/`impactBps` are optional microstructure
    * observations (NaN = absent) feeding the friction ladder. */
  final case class Inputs(
      ticker: String,
      date: java.sql.Timestamp,
      lastPrice: Double,
      atr: Double,
      forecast: Array[Double],     // ensemble point path
      lowerCi: Array[Double],
      upperCi: Array[Double],
      vol: Array[Double],          // per-step sigma (returns scale)
      modelAgreement: Double,      // share of models agreeing on direction
      diagnosticsScore: Double,    // model-health score 0..1
      probUp: Double,
      bid: Double = Double.NaN,
      ask: Double = Double.NaN,
      txnCostBps: Double = Double.NaN,
      impactBps: Double = 0.0,
      assetClass: String = "UNKNOWN",
      depthNotional: Double = Double.NaN,
      orderNotional: Double = 10000.0)

  /** Estimated round-trip cost and which ladder arm produced it. */
  final case class Friction(source: String, roundtripBps: Double) {
    def fraction: Double = roundtripBps / 1e4
  }

  /** The reference's friction preference ladder (:1321-1451):
    * microstructure → LOB walk (when depth is observed) → bid/ask
    * (floored at default) → default. */
  def estimateFriction(in: Inputs, cfg: Config = Config()): Friction = {
    val defaultBps = cfg.defaultRoundtripBps.getOrElse(in.assetClass,
      cfg.defaultRoundtripBps("UNKNOWN"))
    val haveQuote = !in.bid.isNaN && !in.ask.isNaN && in.bid > 0 && in.ask > in.bid
    if (!in.txnCostBps.isNaN) {
      val impact = if (in.impactBps.isNaN) 0.0 else in.impactBps
      val perSide = math.max(0.0, in.txnCostBps + impact)
      Friction("microstructure", 2.0 * perSide)
    } else if (!in.depthNotional.isNaN && in.depthNotional > 0) {
      // LOB arm (:1408-1431): walk the synthetic book with the default
      // order size; roundtrip = 2 × |mid slippage|, floored at default
      val mid = if (haveQuote) 0.5 * (in.bid + in.ask) else in.lastPrice
      val hs = if (haveQuote) 0.5 * (in.ask - in.bid) else 0.0
      if (mid > 0) {
        val fill = graft.exec.LobSim.marketOrderFill(buy = true, mid,
          shares = in.orderNotional / mid, halfSpread = hs,
          depthNotional = in.depthNotional)
        Friction("lob_sim",
          math.max(defaultBps, math.abs(fill.midSlippageBps) * 2.0))
      } else Friction("default", defaultBps)
    } else if (haveQuote) {
      val spreadBps = (in.ask - in.bid) / (0.5 * (in.bid + in.ask)) * 1e4
      Friction("bid_ask", math.max(spreadBps, defaultBps))
    } else Friction("default", defaultBps)
  }

  /** CI-implied z-scale SNR (:1511-1532): |expected return| over the
    * CI-implied return sigma. NaN when the CI is degenerate. */
  def signalToNoise(lastPrice: Double, expectedRet: Double,
      ciLow: Double, ciHigh: Double, z: Double = 1.96): Double = {
    val width = ciHigh - ciLow
    if (lastPrice <= 0 || !width.isFinite || width <= 0) return Double.NaN
    val sigmaReturn = (width / 2.0) / math.max(z, 1e-6) / lastPrice
    if (sigmaReturn <= 0) Double.NaN else math.abs(expectedRet) / sigmaReturn
  }

  def generate(in: Inputs, cfg: Config = Config()): Signal = {
    require(in.forecast.nonEmpty, "empty forecast")
    val horizonPx = in.forecast.last
    val grossRet = if (in.lastPrice != 0) horizonPx / in.lastPrice - 1 else 0.0

    // friction → net trade return (:722-725): the action thresholds see
    // the net; direction survives on the signed expected return
    val friction = estimateFriction(in, cfg)
    val direction = math.signum(grossRet)
    val frictionNet = math.max(0.0, math.abs(grossRet) - friction.fraction)

    // SNR gate (:778-835): CI at the TERMINAL step (the trade horizon —
    // gating a multi-bar trade on a step-1 CI inflates SNR), threshold
    // relaxed by sqrt(horizon/5) because both the cumulative return and
    // the CI width grow with horizon
    val snr = signalToNoise(in.lastPrice, grossRet,
      in.lowerCi.last, in.upperCi.last, cfg.snrZ)
    val horizonScale = math.sqrt(math.max(in.forecast.length, 5).toDouble / 5.0)
    val snrThreshold = cfg.minSnr / horizonScale
    val snrBlocked = !snr.isNaN && snrThreshold > 0 && snr < snrThreshold
    val netTradeReturn = if (snrBlocked) 0.0 else frictionNet
    val expectedRet = direction * netTradeReturn

    // confidence core (weights from the reference :1587-1680); its SNR
    // component is the bounded [0,1] score, not the gate's z-ratio, and
    // its edge term sees the friction-netted return BEFORE the SNR gate
    // zeroes it (the reference computes confidence from the return
    // estimate, not from the gated action input — else every gated
    // signal would report CONFIDENCE_BELOW_THRESHOLD instead of SNR_GATE)
    val ciHalf = math.max(1e-12, (in.upperCi.last - in.lowerCi.last) / 2)
    val snrCore = math.min(1.0, math.abs(horizonPx - in.lastPrice) / ciHalf)
    val edge = math.min(1.0, frictionNet / 0.05)
    val rawConf = 0.2 * in.diagnosticsScore + 0.2 * in.modelAgreement +
      0.2 * snrCore + 0.4 * edge
    // volatility damping: high per-step vol deflates confidence
    val volFactor = 1.0 / (1.0 + 10.0 * in.vol.headOption.getOrElse(0.0))
    val confidence = math.max(0.0, math.min(1.0, cfg.calibrate(rawConf * volFactor)))

    // risk score: vol + CI width relative to price
    val riskScore = math.min(1.0,
      5.0 * in.vol.headOption.getOrElse(0.0) + ciHalf / math.max(in.lastPrice, 1e-9))

    // ATR stop/target with R:R enforcement
    val stopDist = cfg.atrStopMult * math.max(in.atr, 1e-9)
    val dirForLevels = if (direction != 0) direction else 1.0
    val stop = in.lastPrice - dirForLevels * stopDist
    val rawTarget = horizonPx
    val rr = math.abs(rawTarget - in.lastPrice) / stopDist
    val target =
      if (rr >= cfg.minRiskReward) rawTarget
      else in.lastPrice + dirForLevels * cfg.minRiskReward * stopDist

    // action rule (:1981-2017) with the provenance taxonomy (:1026-1032):
    // a MIN_RETURN hold caused by the SNR gate reports SNR_GATE
    val (action, holdReason) =
      if (confidence < cfg.minConfidence) ("HOLD", "CONFIDENCE_BELOW_THRESHOLD")
      else if (netTradeReturn + 1e-12 < cfg.minExpectedReturn)
        ("HOLD", if (snrBlocked) "SNR_GATE" else "MIN_RETURN")
      else if (riskScore > cfg.maxRisk) ("HOLD", "RISK_TOO_HIGH")
      else if (expectedRet > 0) ("BUY", "")
      else if (expectedRet < 0) ("SELL", "")
      else ("HOLD", "ZERO_EXPECTED_RETURN")

    Signal(in.ticker, in.date, action, confidence, expectedRet, riskScore,
      in.lastPrice, stop, target, holdReason)
  }
}
