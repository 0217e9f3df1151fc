package graft.signals

import graft.domain.Signal
import graft.stats.{PortfolioMath, StatTests}

/** Quant success-criteria gate — the institutional-criteria hard gate the
  * reference applies before a signal may trade (/root/reference/models/
  * time_series_signal_generator.py:2242-2672, hard-gate resolution
  * :3245-3299): a profile of portfolio metrics over the trailing
  * direction-adjusted log returns, scored against thresholds, where a
  * configured subset are HARD blockers — any hard failure forces HOLD.
  *
  * Mirrored structural rules from the reference:
  *  - `expected_profit` is non-negotiable: it is always a hard gate when
  *    present, and a NEGATIVE expected profit always fails (:2549-2557,
  *    :3275-3277).
  *  - `crisis_regime_path_risk_block` is a structural invariant that
  *    cannot be removed via config: CRISIS regime + bad path risk = hard
  *    FAIL (:3280-3287).
  *  - default hard set = (expected_profit, significance,
  *    information_ratio) (:3245-3247).
  *
  * Pure scalar math over one ticker's trailing window — runs inside the
  * per-ticker kernel next to [[SignalGenerator]].
  */
object QuantGate {

  final case class Config(
      minExpectedProfit: Double = 0.0,      // economic viability floor (currency)
      maxPValue: Double = 0.10,             // one-sided strategy-vs-zero t-test
      minInformationRatio: Double = 0.2,    // annualized mean/std floor
      minOmega: Double = 1.0,               // soft unless configured hard
      maxEsToEdge: Double = 8.0,            // soft tail-risk bound
      hardGates: Seq[String] = Seq("expected_profit", "significance", "information_ratio"))

  final case class Profile(
      gates: Map[String, Boolean],
      metrics: Map[String, Double],
      hardFailures: Seq[String],
      pass: Boolean)

  /** Evaluate the gate profile.
    *
    * @param trailingLogReturns trailing log returns of the underlying
    * @param direction +1 for BUY, -1 for SELL (strategy returns are
    *                  direction-adjusted, :2269-2274)
    * @param positionValue sized position value (currency)
    * @param netTradeReturn expected net return of the trade after costs
    * @param crisisRegime detector says CRISIS
    * @param pathRiskOk Monte-Carlo path risk acceptable
    */
  def evaluate(trailingLogReturns: Array[Double], direction: Double,
      positionValue: Double, netTradeReturn: Double,
      crisisRegime: Boolean = false, pathRiskOk: Boolean = true,
      cfg: Config = Config()): Profile = {
    require(trailingLogReturns.length >= 2, "need at least 2 trailing returns")
    val strat = trailingLogReturns.map(_ * direction)
    val n = strat.length
    val mean = strat.sum / n
    val sd = {
      val m = mean
      math.sqrt(strat.map(r => (r - m) * (r - m)).sum / (n - 1))
    }
    val expectedProfit = positionValue * netTradeReturn
    val t = if (sd > 0) mean / (sd / math.sqrt(n.toDouble)) else 0.0
    // one-sided P(mean > 0): half the two-sided tail for t > 0, and its
    // complement for t < 0 (monotone decreasing in t everywhere)
    val twoSided = StatTests.tPValue(t, n - 1.0)
    val p = if (t >= 0) twoSided / 2 else 1.0 - twoSided / 2
    val ir = if (sd > 0) mean / sd * math.sqrt(252.0) else 0.0
    val omega = PortfolioMath.omega(strat)
    val esEdge = PortfolioMath.esToEdge(strat)

    val gates = Map(
      // negative expected profit always fails, independent of the floor
      "expected_profit" -> (expectedProfit >= 0 && expectedProfit >= cfg.minExpectedProfit),
      "significance" -> (p <= cfg.maxPValue),
      "information_ratio" -> (ir >= cfg.minInformationRatio),
      "omega" -> (omega >= cfg.minOmega),
      "es_to_edge" -> (esEdge.isNaN || esEdge <= cfg.maxEsToEdge),
      "crisis_regime_path_risk_block" -> !(crisisRegime && !pathRiskOk))

    // hard set = configured (names validated — a typo'd criterion must
    // not silently weaken enforcement), with the two structural
    // invariants forced in (expected_profit first, crisis block appended)
    val unknown = cfg.hardGates.filterNot(gates.contains)
    require(unknown.isEmpty,
      s"unknown hard gate criteria: ${unknown.mkString(",")} (known: ${gates.keys.toSeq.sorted.mkString(",")})")
    val hard = (("expected_profit" +: cfg.hardGates) :+
      "crisis_regime_path_risk_block").distinct
    val hardFailures = hard.filter(k => !gates(k)).sorted
    Profile(
      gates,
      Map("expected_profit" -> expectedProfit, "p_value" -> p,
        "information_ratio" -> ir, "omega" -> omega, "es_to_edge" -> esEdge,
        "t_stat" -> t),
      hardFailures,
      pass = hardFailures.isEmpty)
  }

  /** Apply the gate: any hard failure forces a tradeable signal to HOLD
    * with a structured reason listing the failed criteria. */
  def apply(sig: Signal, profile: Profile): Signal =
    if (profile.pass || sig.action == "HOLD") sig
    else sig.copy(action = "HOLD",
      holdReason = "QUANT_GATE:" + profile.hardFailures.mkString(","))
}
