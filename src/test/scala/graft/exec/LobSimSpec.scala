package graft.exec

import org.scalatest.funsuite.AnyFunSuite

/** Properties of the LOB market-order fill walk (reference contract:
  * execution/lob_simulator.py:51-170). */
class LobSimSpec extends AnyFunSuite {

  private val mid = 100.0

  test("BUY walks up from mid + half-spread; VWAP worsens monotonically with size") {
    val sizes = Seq(10.0, 100.0, 500.0, 2000.0)
    val vwaps = sizes.map(s => LobSim.marketOrderFill(buy = true, mid,
      shares = s, halfSpread = 0.05, depthNotional = 50000.0).vwapPrice)
    assert(vwaps.head >= mid + 0.05 - 1e-12)
    vwaps.zip(vwaps.tail).foreach { case (a, b) =>
      assert(b >= a - 1e-12, s"vwap must be monotone in size: $vwaps")
    }
  }

  test("SELL mirrors: VWAP below mid, worsening (falling) with size") {
    val small = LobSim.marketOrderFill(buy = false, mid, shares = 10.0,
      halfSpread = 0.05, depthNotional = 50000.0)
    val big = LobSim.marketOrderFill(buy = false, mid, shares = 2000.0,
      halfSpread = 0.05, depthNotional = 50000.0)
    assert(small.vwapPrice <= mid - 0.05 + 1e-12)
    assert(big.vwapPrice <= small.vwapPrice + 1e-12)
    assert(small.midSlippageBps < 0 && big.midSlippageBps <= small.midSlippageBps)
  }

  test("deeper book → strictly less slippage for the same order") {
    val thin = LobSim.marketOrderFill(buy = true, mid, shares = 1000.0,
      depthNotional = 20000.0)
    val deep = LobSim.marketOrderFill(buy = true, mid, shares = 1000.0,
      depthNotional = 500000.0)
    assert(deep.vwapPrice < thin.vwapPrice)
    assert(deep.levelsConsumed <= thin.levelsConsumed)
  }

  test("exhaustion: an order beyond visible depth pays the deep-tail penalty") {
    val fill = LobSim.marketOrderFill(buy = true, mid, shares = 10000.0,
      depthNotional = 10000.0) // 10k shares ~ $1M into $10k of depth
    assert(fill.exhausted)
    assert(fill.levelsConsumed === LobSim.Config().levels)
    // tail price is maxExhaustLevels ticks beyond the start
    val tailPx = fill.startPrice +
      LobSim.Config().maxExhaustLevels * (mid * 1.0 / 1e4)
    assert(fill.vwapPrice > fill.startPrice && fill.vwapPrice <= tailPx + 1e-9)
  }

  test("degenerate contracts: zero depth fills exhausted at start; zero shares/mid are no-ops") {
    val noDepth = LobSim.marketOrderFill(buy = true, mid, shares = 100.0)
    assert(noDepth.exhausted && noDepth.vwapPrice === noDepth.startPrice &&
      noDepth.levelsConsumed === 1)
    val noShares = LobSim.marketOrderFill(buy = true, mid, shares = 0.0,
      depthNotional = 1000.0)
    assert(!noShares.exhausted && noShares.vwapPrice === mid)
    val noMid = LobSim.marketOrderFill(buy = true, 0.0, shares = 10.0,
      depthNotional = 1000.0)
    assert(noMid.vwapPrice === 0.0 && noMid.levelsConsumed === 0)
  }

  test("friction ladder: observed depth engages the lob_sim arm between microstructure and bid/ask") {
    import graft.signals.SignalGenerator
    val base = SignalGenerator.Inputs("T", new java.sql.Timestamp(0),
      lastPrice = 100, atr = 1.0, forecast = Array(103.0),
      lowerCi = Array(102.0), upperCi = Array(104.0), vol = Array(0.01),
      modelAgreement = 1.0, diagnosticsScore = 1.0, probUp = 0.7)
    // depth alone → lob_sim (floored at the 10bps default)
    val lob = SignalGenerator.estimateFriction(base.copy(depthNotional = 50000.0))
    assert(lob.source === "lob_sim" && lob.roundtripBps >= 10.0)
    // a thin book costs more than a deep one
    val thin = SignalGenerator.estimateFriction(
      base.copy(depthNotional = 2000.0, bid = 99.8, ask = 100.2))
    val deep = SignalGenerator.estimateFriction(
      base.copy(depthNotional = 5000000.0, bid = 99.8, ask = 100.2))
    assert(thin.source === "lob_sim" && deep.source === "lob_sim")
    assert(thin.roundtripBps > deep.roundtripBps)
    // microstructure columns still take precedence over depth
    val micro = SignalGenerator.estimateFriction(
      base.copy(depthNotional = 50000.0, txnCostBps = 3.0, impactBps = 2.0))
    assert(micro.source === "microstructure")
  }
}
