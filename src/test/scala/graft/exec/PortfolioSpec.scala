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
      synth: Boolean = false) =
    Event("T", new Timestamp(86400000L * i), price, action, conf, synth)

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
    assert(risky.action === "HOLD" && risky.holdReason === "LOW_CONFIDENCE" ||
      risky.holdReason === "RISK_TOO_HIGH")
  }
}
