package graft.exec

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.exec.PortfolioEngine.{Config, Event}
import graft.signals.SignalGenerator
import graft.store.{IntegrityAuditor, TradeViews}

class PortfolioSpec extends AnyFunSuite with TestSpark {

  private def ev(i: Int, price: Double, action: String, conf: Double = 0.8,
      synth: Boolean = false, atr: Double = 0.0) =
    Event("T", new Timestamp(86400000L * i), price, action, conf, synth, atr)

  test("FIFO: closes consume oldest lot first, with partial allocation") {
    // prices stay inside the stop/target bands so only the SELL closes
    val rows = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "BUY"), ev(2, 104, "BUY"), ev(3, 108, "SELL")))
    val opens = rows.filter(!_.isClose)
    val closes = rows.filter(_.isClose)
    assert(opens.size === 2 && closes.size === 2)
    // first close allocation references the FIRST open (FIFO)
    assert(closes.map(_.entryTradeId) === opens.map(_.tradeId))
    // pnl per allocation = (exit - entry) * qty
    closes.zip(opens).foreach { case (c, o) =>
      assert(math.abs(c.pnl - (108 - o.price) * c.quantity) < 1e-9)
    }
  }

  test("live lots are consumed before synthetic lots (provenance priority)") {
    val rows = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "BUY", synth = true),
      ev(2, 100, "BUY", synth = false),
      ev(3, 105, "SELL")),
      Config(kellyCap = 0.10))
    val opens = rows.filter(!_.isClose)
    val syntheticOpen = opens.find(_.isSynthetic).get
    val liveOpen = opens.find(!_.isSynthetic).get
    val closes = rows.filter(_.isClose)
    assert(closes.head.entryTradeId === liveOpen.tradeId)
    assert(closes.last.entryTradeId === syntheticOpen.tradeId)
  }

  test("stop loss / take profit / time exits trigger") {
    val stop = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "BUY"), ev(2, 90, "HOLD")))
    assert(stop.exists(r => r.isClose && r.exitReason == "STOP_LOSS"))
    val tp = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "BUY"), ev(2, 115, "HOLD")))
    assert(tp.exists(r => r.isClose && r.exitReason == "TAKE_PROFIT"))
    val time = PortfolioEngine.runTicker(
      ev(1, 100, "BUY") +: (2 to 25).map(i => ev(i, 100.5, "HOLD")))
    assert(time.exists(r => r.isClose && r.exitReason == "TIME"))
  }

  test("a lifecycle trigger closes the ENTIRE position, not just the triggering lot") {
    // lot1 at 100 is down 6% at bar 3 (stop); lot2 at 98 is only down ~4%.
    // Reference semantics: the stop closes the whole ticker position, and
    // every allocation carries the STOP_LOSS reason.
    val rows = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "BUY"), ev(2, 98, "BUY"), ev(3, 94, "HOLD"), ev(4, 94, "HOLD")))
    val opens = rows.filter(!_.isClose)
    val closes = rows.filter(_.isClose)
    assert(opens.size === 2)
    assert(closes.nonEmpty)
    assert(closes.forall(_.exitReason == "STOP_LOSS"))
    // all opened quantity is closed — nothing remains after the trigger bar
    assert(math.abs(opens.map(_.quantity).sum - closes.map(_.quantity).sum) < 1e-9)
    // and both opens are referenced by the allocations
    assert(closes.map(_.entryTradeId).toSet === opens.map(_.tradeId).toSet)
    // stop beats time: a position simultaneously past max-hold and below the
    // stop reports STOP_LOSS (reference checks price exits first)
    val mixed = PortfolioEngine.runTicker(
      ev(1, 100, "BUY") +: (2 to 24).map(i => ev(i, 100.5, "HOLD")) :+ ev(25, 90, "HOLD"))
    val trig = mixed.filter(_.isClose)
    assert(trig.nonEmpty && trig.forall(_.exitReason == "TIME")) // time fires at bar 21 first
    val stopBeatsTime = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "BUY"), ev(2, 101, "HOLD"), ev(3, 94, "HOLD")))
    assert(stopBeatsTime.filter(_.isClose).forall(_.exitReason == "STOP_LOSS"))
  }

  test("property: FIFO conservation — closed quantity equals opened-and-exited quantity") {
    val rng = new scala.util.Random(123)
    (1 to 60).foreach { _ =>
      val events = (1 to 40).map { i =>
        val p = 50.0 + rng.nextDouble() * 100.0
        val a = rng.nextInt(7) match {
          case 0 | 1 | 2 => "BUY"
          case 3 | 4 => "SELL"
          case _ => "HOLD"
        }
        ev(i, p, a)
      }
      val rows = PortfolioEngine.runTicker(events)
      // trade ids never repeat within a run: state carries a monotonic
      // nextId and every fill consumes one — the invariant behind the
      // live fill sink's MergeSink assumeUniqueKeys fast path
      val tids = rows.map(_.tradeId)
      assert(tids.distinct.size === tids.size)
      val opened = rows.filter(!_.isClose).map(_.quantity).sum
      val closed = rows.filter(_.isClose).map(_.quantity).sum
      assert(closed <= opened + 1e-9)
      // every allocation references a real open, never over-consumes it
      val openQty = rows.filter(!_.isClose).map(r => r.tradeId -> r.quantity).toMap
      rows.filter(_.isClose).groupBy(_.entryTradeId).foreach { case (id, allocs) =>
        assert(openQty.contains(id))
        assert(allocs.map(_.quantity).sum <= openQty(id) + 1e-9)
      }
      // cash conservation: equity change equals realized+unrealized pnl
      val realized = rows.filter(_.isClose).map(_.pnl).sum
      val lastPrice = events.last.price
      val residualQty = opened - closed
      val costOfOpen = rows.filter(!_.isClose).map(r => r.quantity * r.price).sum
      val proceeds = rows.filter(_.isClose).map(r => r.quantity * r.price).sum
      val unrealized = residualQty * lastPrice -
        (costOfOpen - (proceeds - realized)) // cost basis of remaining lots
      assert(!(realized.isNaN || unrealized.isNaN))
    }
  }

  test("distributed backtest matches the single-ticker kernel per ticker") {
    val spark2 = spark
    import spark2.implicits._
    val events = Seq("A", "B").flatMap { t =>
      (1 to 30).map(i => Event(t, new Timestamp(86400000L * i),
        100 + (i * 7 % 13) - 6.0, if (i % 3 == 0) "BUY" else if (i % 7 == 0) "SELL" else "HOLD",
        0.9, isSynthetic = false))
    }
    val df = events.toDF()
    val dist = PortfolioEngine.backtest(df).collect()
    val local = events.groupBy(_.ticker).flatMap { case (_, evs) =>
      PortfolioEngine.runTicker(evs.sortBy(_.ts.getTime))
    }
    assert(dist.toSet === local.toSet)
  }

  test("trade views + integrity audit over engine output") {
    val spark2 = spark
    import spark2.implicits._
    val events = (1 to 60).map(i => ev(i, 100 + 10 * math.sin(i / 3.0),
      if (i % 4 == 1) "BUY" else if (i % 9 == 0) "SELL" else "HOLD"))
    val fills = PortfolioEngine.runTicker(events)
    val trades = fills.toDF()
      .withColumnRenamed("tradeId", "trade_id")
      .withColumnRenamed("isClose", "is_close")
      .withColumnRenamed("entryTradeId", "entry_trade_id")
      .withColumnRenamed("isSynthetic", "is_synthetic")
    val rt = TradeViews.roundTrips(trades)
    assert(rt.count() === fills.count(_.isClose))
    assert(rt.where(col("entry_price").isNull).isEmpty)
    val perf = TradeViews.performanceSummary(trades.where(col("is_close"))).head()
    assert(perf.getAs[Long]("n_trades") === fills.count(_.isClose))
    val report = IntegrityAuditor.audit(
      trades.withColumn("pnl", when(col("is_close"), col("pnl")))
        .withColumn("action", when(col("is_close"), "SELL").otherwise("BUY")))
    assert(report.clean, report.toString)
  }

  test("short side: flat SELL opens a short, BUY covers FIFO with provenance priority") {
    val rows = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "SELL", synth = true), // short opened (synthetic lot)
      ev(2, 101, "SELL"),               // stacked short (live lot)
      ev(3, 95, "BUY")))                // covers the whole short
    val opens = rows.filter(!_.isClose)
    val covers = rows.filter(_.isClose)
    assert(opens.size === 2 && opens.forall(o => o.side == "SHORT" && o.action == "SELL"))
    assert(covers.size === 2 && covers.forall(c => c.side == "SHORT" && c.action == "BUY"))
    assert(covers.forall(_.exitReason == "SIGNAL"))
    // provenance priority on the short book too: live covered first
    val live = opens.find(!_.isSynthetic).get
    val synth = opens.find(_.isSynthetic).get
    assert(covers.head.entryTradeId === live.tradeId)
    assert(covers.last.entryTradeId === synth.tradeId)
    // short pnl = (entry - cover) * qty, positive on the price drop
    covers.foreach { c =>
      val o = opens.find(_.tradeId == c.entryTradeId).get
      assert(math.abs(c.pnl - (o.price - 95.0) * c.quantity) < 1e-9)
      assert(c.pnl > 0)
    }
  }

  test("property: short-lot conservation — covered quantity never exceeds shorted quantity") {
    val rng = new scala.util.Random(321)
    (1 to 60).foreach { _ =>
      val events = (1 to 40).map { i =>
        val p = 50.0 + rng.nextDouble() * 100.0
        val a = rng.nextInt(7) match {
          case 0 | 1 => "BUY"
          case 2 | 3 | 4 => "SELL"
          case _ => "HOLD"
        }
        ev(i, p, a)
      }
      val rows = PortfolioEngine.runTicker(events)
      val shortOpens = rows.filter(r => !r.isClose && r.side == "SHORT")
      val covers = rows.filter(r => r.isClose && r.side == "SHORT")
      assert(covers.map(_.quantity).sum <= shortOpens.map(_.quantity).sum + 1e-9)
      // every cover references a real short open, never over-consumes it
      val openQty = shortOpens.map(r => r.tradeId -> r.quantity).toMap
      covers.groupBy(_.entryTradeId).foreach { case (id, allocs) =>
        assert(openQty.contains(id))
        assert(allocs.map(_.quantity).sum <= openQty(id) + 1e-9)
      }
      // sides never coexist: after each event, long XOR short open book
      assert(rows.forall(r => !r.pnl.isNaN))
    }
  }

  test("trailing ATR ratchet locks in gains and only ever tightens the stop") {
    // long: entry 100, ATR 2 → initial stop 95. +3.5 arms the 1.5-ATR
    // ratchet (stop → 101); the later dip to 100.9 hits the RATCHETED
    // stop for a positive pnl — impossible without the ratchet (95 stop).
    // The intermediate bar at 102 (profit 1.0 ATR, candidate stop 100)
    // must NOT loosen the 101 stop: monotonicity.
    val rows = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "BUY", atr = 2.0), ev(2, 103.5, "HOLD"),
      ev(3, 102, "HOLD"), ev(4, 100.9, "HOLD")))
    val closes = rows.filter(_.isClose)
    assert(closes.nonEmpty && closes.forall(_.exitReason == "STOP_LOSS"))
    assert(closes.forall(_.pnl > 0), s"ratcheted stop should exit in profit: $closes")
    assert(closes.forall(c => math.abs(c.price - 100.9) < 1e-9))
    // without an ATR snapshot the ratchet stays disarmed (reference rule:
    // missing entry-time ATR leaves the stop unchanged) — no exit at 100.9
    val noAtr = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "BUY"), ev(2, 103.5, "HOLD"),
      ev(3, 102, "HOLD"), ev(4, 100.9, "HOLD")))
    assert(!noAtr.exists(_.isClose))
    // short mirror: entry 100, ATR 2 → stop 105; -3.5 ratchets stop to 99;
    // the bounce to 99.5 stops out with the short still in profit
    val short = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "SELL", atr = 2.0), ev(2, 96.5, "HOLD"), ev(3, 99.5, "HOLD")))
    val sc = short.filter(_.isClose)
    assert(sc.nonEmpty && sc.forall(_.exitReason == "STOP_LOSS"))
    assert(sc.forall(_.pnl > 0), s"short ratchet should lock gains: $sc")
  }

  test("slippage entry simulation: fills are adverse on the aggressor side") {
    val cfg = Config(slippagePct = 0.001)
    val rows = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "BUY"), ev(2, 104, "SELL")), cfg)
    val open = rows.find(!_.isClose).get
    val close = rows.find(_.isClose).get
    assert(open.price > 100.0, s"buy fill should pay up: ${open.price}")
    assert(close.price < 104.0, s"sell fill should concede: ${close.price}")
    // pnl strictly worse than the frictionless fill
    val frictionless = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "BUY"), ev(2, 104, "SELL")))
    assert(close.pnl < frictionless.find(_.isClose).get.pnl)
    // short open concedes, cover pays up
    val short = PortfolioEngine.runTicker(Seq(
      ev(1, 100, "SELL"), ev(2, 96, "BUY")), cfg)
    assert(short.find(!_.isClose).get.price < 100.0)
    assert(short.find(_.isClose).get.price > 96.0)
  }

  test("risk modes: stricter modes size smaller positions, floors lift low-confidence sizing") {
    import PortfolioEngine.RiskMode
    def openQty(cfg: Config, conf: Double = 0.9): Double =
      PortfolioEngine.runTicker(Seq(ev(1, 100, "BUY", conf = conf)), cfg)
        .find(!_.isClose).map(_.quantity).getOrElse(0.0)
    val prod = openQty(RiskMode.production())
    val research = openQty(RiskMode.researchProduction())
    val diag = openQty(RiskMode.diagnostic())
    assert(prod < research && research < diag, s"$prod $research $diag")
    // caps are the yml ratios: 2% / 5% / 10% of equity at full confidence
    assert(math.abs(research / prod - 2.5) < 1e-6)
    assert(math.abs(diag / prod - 5.0) < 1e-6)
    // the confidence floor binds: at conf=0.05 production sizes with its
    // 0.50 floor, not the raw confidence
    val floored = openQty(RiskMode.production(), conf = 0.05)
    assert(math.abs(floored - prod * 0.50 / 0.90) < 1e-9)
    // shorts use the tighter cap (1% vs 2% in production)
    val shortQty = PortfolioEngine.runTicker(
      Seq(ev(1, 100, "SELL")), RiskMode.production())
      .find(!_.isClose).map(_.quantity).getOrElse(0.0)
    val longQty = openQty(RiskMode.production(), conf = 0.8)
    assert(math.abs(shortQty / longQty - 0.5) < 1e-6)
  }

  test("short-orphan audit: clean on engine output, flags an injected orphan cover") {
    val spark2 = spark
    import spark2.implicits._
    val events = (1 to 50).map(i => ev(i, 100 + 8 * math.sin(i / 2.5),
      if (i % 5 == 2) "SELL" else if (i % 7 == 0) "BUY" else "HOLD"))
    val fills = PortfolioEngine.runTicker(events)
    assert(fills.exists(r => r.side == "SHORT" && r.isClose), "scenario must cover shorts")
    val trades = fills.toDF()
      .withColumnRenamed("tradeId", "trade_id")
      .withColumnRenamed("isClose", "is_close")
      .withColumnRenamed("entryTradeId", "entry_trade_id")
      .withColumnRenamed("isSynthetic", "is_synthetic")
      .withColumn("pnl", when(col("is_close"), col("pnl")))
    assert(IntegrityAuditor.audit(trades).clean)
    // inject a cover whose opener does not exist → the SHORT audit flags it
    val orphan = Seq(("T", new Timestamp(0L), 999L, "BUY", 1.0, 50.0, true,
      888L, 1.0, "SIGNAL", false, "SHORT"))
      .toDF("ticker", "ts", "trade_id", "action", "quantity", "price",
        "is_close", "entry_trade_id", "pnl", "exitReason", "is_synthetic", "side")
    val poisoned = trades.unionByName(orphan)
    assert(IntegrityAuditor.shortOrphanedCloses(poisoned).count() === 1)
    assert(IntegrityAuditor.audit(poisoned).shortOrphanedCloses === 1)
    // cross-side linkage break: a cover pointing at a LONG opener is a
    // short-orphan violation even though the referenced trade id exists
    // (the audit only reads these four columns)
    val crossSide = Seq(
      (997L, "BUY", false, -1L), // a LONG open
      (998L, "BUY", true, 997L)) // a "cover" whose opener is that long
      .toDF("trade_id", "action", "is_close", "entry_trade_id")
    assert(IntegrityAuditor.shortOrphanedCloses(crossSide).count() === 1)
  }

  test("signal generator: action thresholds, hold reasons, R:R enforcement") {
    val base = SignalGenerator.Inputs("T", new Timestamp(0), lastPrice = 100,
      atr = 1.0, forecast = Array(101, 102, 104), lowerCi = Array(99, 99, 100),
      upperCi = Array(103, 105, 108), vol = Array(0.01, 0.01, 0.01),
      modelAgreement = 1.0, diagnosticsScore = 0.9, probUp = 0.7)
    val buy = SignalGenerator.generate(base)
    assert(buy.action === "BUY")
    assert((buy.takeProfit - 100) / (100 - buy.stopLoss) >= 2.0 - 1e-9)
    val sell = SignalGenerator.generate(base.copy(
      forecast = Array(99, 97, 95), lowerCi = Array(92, 91, 90),
      upperCi = Array(100, 100, 100)))
    assert(sell.action === "SELL")
    assert(sell.stopLoss > 100 && sell.takeProfit < 100)
    val hold = SignalGenerator.generate(base.copy(
      modelAgreement = 0.0, diagnosticsScore = 0.0,
      forecast = Array(100.05, 100.05, 100.05)))
    assert(hold.action === "HOLD" && hold.holdReason.nonEmpty)
    val risky = SignalGenerator.generate(base.copy(vol = Array(0.5, 0.5, 0.5)))
    assert(risky.action === "HOLD" &&
      (risky.holdReason === "CONFIDENCE_BELOW_THRESHOLD" ||
        risky.holdReason === "RISK_TOO_HIGH"))
  }

  test("friction estimator ladder: microstructure > bid/ask > asset-class default") {
    import SignalGenerator.{Config, Inputs, estimateFriction}
    val base = Inputs("T", new Timestamp(0), lastPrice = 100, atr = 1.0,
      forecast = Array(103.0), lowerCi = Array(102.0), upperCi = Array(104.0),
      vol = Array(0.01), modelAgreement = 1.0, diagnosticsScore = 1.0, probUp = 0.7)
    // microstructure columns win: roundtrip = 2 * (txn + impact)
    val micro = estimateFriction(base.copy(txnCostBps = 3.0, impactBps = 2.0))
    assert(micro.source === "microstructure" && micro.roundtripBps === 10.0)
    // bid/ask spread next, floored at the asset-class default
    val spread = estimateFriction(base.copy(bid = 99.9, ask = 100.1))
    assert(spread.source === "bid_ask" && math.abs(spread.roundtripBps - 20.0) < 1e-9)
    val tight = estimateFriction(base.copy(bid = 99.99, ask = 100.01))
    assert(tight.roundtripBps === 10.0, "floored at the default, not 2bps")
    // asset-class defaults
    assert(estimateFriction(base).roundtripBps === 10.0)
    assert(estimateFriction(base.copy(assetClass = "FX")).roundtripBps === 4.0)
  }

  test("friction flips a marginal BUY to HOLD with the MIN_RETURN reason") {
    import SignalGenerator.Inputs
    // gross +1.05%: clears minExpectedReturn=1% gross but NOT net of the
    // 10bps default round trip (net 0.95%)
    val in = Inputs("T", new Timestamp(0), lastPrice = 100, atr = 0.5,
      forecast = Array(100.4, 100.8, 101.05),
      lowerCi = Array(100.0, 100.1, 100.3), upperCi = Array(100.8, 101.5, 101.8),
      vol = Array(0.005), modelAgreement = 1.0, diagnosticsScore = 1.0, probUp = 0.7)
    val held = SignalGenerator.generate(in)
    assert(held.action === "HOLD" && held.holdReason === "MIN_RETURN",
      s"${held.action}/${held.holdReason}")
    // identical inputs with zero microstructure cost → the BUY goes through
    val free = SignalGenerator.generate(in.copy(txnCostBps = 0.0, impactBps = 0.0))
    assert(free.action === "BUY", s"${free.action}/${free.holdReason}")
    assert(free.expectedReturn > held.expectedReturn)
  }

  test("SNR gate: a wide CI suppresses an otherwise tradeable signal with reason SNR_GATE") {
    import SignalGenerator.Inputs
    // gross +3% but the CI half-width implies sigma ~10% of price:
    // snr = 0.03 / 0.102 ≈ 0.29 << 1.5 → net zeroed, reason SNR_GATE
    val wide = Inputs("T", new Timestamp(0), lastPrice = 100, atr = 1.0,
      forecast = Array(101.0, 102.0, 103.0),
      lowerCi = Array(90.0, 85.0, 83.0), upperCi = Array(112.0, 119.0, 123.0),
      vol = Array(0.005), modelAgreement = 1.0, diagnosticsScore = 1.0, probUp = 0.7)
    val gated = SignalGenerator.generate(wide)
    assert(gated.action === "HOLD" && gated.holdReason === "SNR_GATE",
      s"${gated.action}/${gated.holdReason}")
    assert(gated.expectedReturn === 0.0)
    // same point forecast with a tight CI sails through the gate
    val tight = SignalGenerator.generate(wide.copy(
      lowerCi = Array(100.0, 100.5, 101.0), upperCi = Array(102.0, 103.5, 105.0)))
    assert(tight.action === "BUY", s"${tight.action}/${tight.holdReason}")
  }
}
