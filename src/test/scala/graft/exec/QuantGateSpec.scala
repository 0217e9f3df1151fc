package graft.exec

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.signals.{QuantGate, SignalGenerator}

/** The quant success-criteria hard gate: profitable significant series
  * pass, negative expected profit always blocks, the crisis+path-risk
  * structural invariant cannot be configured away, and gating a signal
  * forces HOLD with a structured reason. */
class QuantGateSpec extends AnyFunSuite {

  private def trendingReturns(n: Int, drift: Double, seed: Long): Array[Double] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)(drift + 0.002 * rng.nextGaussian())
  }

  test("a clearly profitable, significant strategy passes all hard gates") {
    val p = QuantGate.evaluate(trendingReturns(250, 0.002, 7), direction = 1.0,
      positionValue = 1000.0, netTradeReturn = 0.02)
    assert(p.pass, p.hardFailures.mkString(","))
    assert(p.gates("expected_profit") && p.gates("significance") && p.gates("information_ratio"))
    assert(p.metrics("omega") > 1.0)
  }

  test("negative expected profit always hard-fails, even with a permissive floor") {
    val p = QuantGate.evaluate(trendingReturns(250, 0.002, 7), direction = 1.0,
      positionValue = 1000.0, netTradeReturn = -0.01,
      cfg = QuantGate.Config(minExpectedProfit = -1e9, hardGates = Seq("significance")))
    assert(!p.pass && p.hardFailures.contains("expected_profit"))
  }

  test("a driftless noisy strategy fails significance and information ratio") {
    val p = QuantGate.evaluate(trendingReturns(250, 0.0, 11), direction = 1.0,
      positionValue = 1000.0, netTradeReturn = 0.01)
    assert(!p.pass)
    assert(p.hardFailures.intersect(Seq("significance", "information_ratio")).nonEmpty)
  }

  test("a profitable SHORT passes: direction-adjusted returns and trade return") {
    // downtrending underlying: long loses, short wins
    val down = trendingReturns(250, -0.002, 17)
    val short = QuantGate.evaluate(down, direction = -1.0,
      positionValue = 1000.0, netTradeReturn = 0.02) // dir * expectedReturn > 0
    assert(short.pass, short.hardFailures.mkString(","))
    val long = QuantGate.evaluate(down, direction = 1.0,
      positionValue = 1000.0, netTradeReturn = -0.02)
    assert(!long.pass)
  }

  test("one-sided p-value is monotone in t: worse strategies have LARGER p") {
    val good = QuantGate.evaluate(trendingReturns(250, 0.002, 7), 1.0, 1000.0, 0.02)
    val flat = QuantGate.evaluate(trendingReturns(250, 0.0, 11), 1.0, 1000.0, 0.01)
    val bad = QuantGate.evaluate(trendingReturns(250, -0.002, 7), 1.0, 1000.0, 0.01)
    assert(good.metrics("p_value") < flat.metrics("p_value"))
    assert(flat.metrics("p_value") < bad.metrics("p_value"))
    assert(bad.metrics("p_value") > 0.9) // significantly bad => p near 1
  }

  test("unknown hard-gate names are rejected, not silently dropped") {
    intercept[IllegalArgumentException] {
      QuantGate.evaluate(trendingReturns(250, 0.002, 7), 1.0, 1000.0, 0.02,
        cfg = QuantGate.Config(hardGates = Seq("omega_ratio")))
    }
  }

  test("crisis + bad path risk is a structural block that config cannot remove") {
    val p = QuantGate.evaluate(trendingReturns(250, 0.002, 7), direction = 1.0,
      positionValue = 1000.0, netTradeReturn = 0.02,
      crisisRegime = true, pathRiskOk = false,
      cfg = QuantGate.Config(hardGates = Seq.empty))
    assert(!p.pass && p.hardFailures === Seq("crisis_regime_path_risk_block"))
  }

  test("gating forces a tradeable signal to HOLD with a structured reason; HOLD passes through") {
    val sig = SignalGenerator.generate(SignalGenerator.Inputs(
      "T", new Timestamp(0), lastPrice = 100, atr = 1.0,
      forecast = Array(103.0), lowerCi = Array(102.0), upperCi = Array(104.0),
      vol = Array(0.01), modelAgreement = 1.0, diagnosticsScore = 1.0, probUp = 0.7))
    assert(sig.action === "BUY")
    val fail = QuantGate.evaluate(trendingReturns(250, 0.0, 11), 1.0, 1000.0, 0.01)
    val gated = QuantGate(sig, fail)
    assert(gated.action === "HOLD" && gated.holdReason.startsWith("QUANT_GATE:"))
    assert(QuantGate(gated, fail).action === "HOLD") // idempotent on HOLD
    val pass = QuantGate.evaluate(trendingReturns(250, 0.002, 7), 1.0, 1000.0, 0.02)
    assert(QuantGate(sig, pass) === sig)
  }

  test("Platt-calibrated confidence hook reshapes confidence monotonically") {
    val in = SignalGenerator.Inputs(
      "T", new Timestamp(0), lastPrice = 100, atr = 1.0,
      forecast = Array(103.0), lowerCi = Array(102.0), upperCi = Array(104.0),
      vol = Array(0.01), modelAgreement = 0.8, diagnosticsScore = 0.8, probUp = 0.7)
    val raw = SignalGenerator.generate(in)
    val cal = graft.stats.PortfolioMath.plattApply(a = 3.0, b = -1.5) _
    val calibrated = SignalGenerator.generate(in,
      SignalGenerator.Config(calibrate = cal))
    assert(calibrated.confidence !== raw.confidence) // calibrator applied
    // monotone: higher raw core => higher calibrated confidence
    val lower = SignalGenerator.generate(in.copy(modelAgreement = 0.2),
      SignalGenerator.Config(calibrate = cal))
    assert(calibrated.confidence > lower.confidence)
  }
}
