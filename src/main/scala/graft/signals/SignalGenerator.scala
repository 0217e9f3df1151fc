package graft.signals

import graft.domain.Signal

/** Per-ticker signal generation — rebuild of the decision core of
  * /root/reference/models/time_series_signal_generator.py:176-4289:
  * expected return from the forecast bundle (:1313-1451), CI-based
  * signal-to-noise (:1452-1532), the weighted confidence core
  * 0.2·diag + 0.2·agreement + 0.2·snr + 0.4·edge (:1587-1680), the
  * BUY/SELL/HOLD action rule with structured hold reasons (:1981-2017),
  * and ATR-based stop/target with R:R ≥ 2 enforcement (:2049-2102).
  *
  * Pure scalar math over one ticker's forecast payload — runs inside the
  * per-ticker kernel; Spark parallelizes across tickers.
  */
object SignalGenerator {

  final case class Config(
      buyThreshold: Double = 0.01,
      sellThreshold: Double = -0.01,
      minConfidence: Double = 0.45,
      maxRisk: Double = 0.75,
      atrStopMult: Double = 2.0,
      minRiskReward: Double = 2.0,
      frictionBps: Double = 10.0,
      // Confidence calibrator applied to the raw damped core — plug
      // PortfolioMath.plattApply(a, b) fitted on realized outcomes for
      // the reference's Platt-calibrated confidence (:3724-4069)
      calibrate: Double => Double = identity)

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
      probUp: Double)

  def generate(in: Inputs, cfg: Config = Config()): Signal = {
    require(in.forecast.nonEmpty, "empty forecast")
    val horizonPx = in.forecast.last
    val grossRet = if (in.lastPrice != 0) horizonPx / in.lastPrice - 1 else 0.0
    val friction = cfg.frictionBps / 1e4
    val expectedRet = grossRet - math.signum(grossRet) * friction

    // CI signal-to-noise: point move vs CI half-width at horizon
    val ciHalf = math.max(1e-12, (in.upperCi.last - in.lowerCi.last) / 2)
    val snr = math.min(1.0, math.abs(horizonPx - in.lastPrice) / ciHalf)

    // confidence core (weights from the reference)
    val edge = math.min(1.0, math.abs(expectedRet) / 0.05)
    val rawConf = 0.2 * in.diagnosticsScore + 0.2 * in.modelAgreement +
      0.2 * snr + 0.4 * edge
    // volatility damping: high per-step vol deflates confidence
    val volFactor = 1.0 / (1.0 + 10.0 * in.vol.headOption.getOrElse(0.0))
    val confidence = math.max(0.0, math.min(1.0, cfg.calibrate(rawConf * volFactor)))

    // risk score: vol + CI width relative to price
    val riskScore = math.min(1.0,
      5.0 * in.vol.headOption.getOrElse(0.0) + ciHalf / math.max(in.lastPrice, 1e-9))

    // ATR stop/target with R:R enforcement
    val stopDist = cfg.atrStopMult * math.max(in.atr, 1e-9)
    val direction = math.signum(expectedRet)
    val stop = in.lastPrice - direction * stopDist
    val rawTarget = horizonPx
    val rr = math.abs(rawTarget - in.lastPrice) / stopDist
    val target =
      if (rr >= cfg.minRiskReward) rawTarget
      else in.lastPrice + direction * cfg.minRiskReward * stopDist

    val (action, holdReason) =
      if (confidence < cfg.minConfidence) ("HOLD", "LOW_CONFIDENCE")
      else if (riskScore > cfg.maxRisk) ("HOLD", "RISK_TOO_HIGH")
      else if (expectedRet >= cfg.buyThreshold) ("BUY", "")
      else if (expectedRet <= cfg.sellThreshold) ("SELL", "")
      else ("HOLD", "RETURN_BELOW_THRESHOLD")

    Signal(in.ticker, in.date, action, confidence, expectedRet, riskScore,
      in.lastPrice, stop, target, holdReason)
  }
}
