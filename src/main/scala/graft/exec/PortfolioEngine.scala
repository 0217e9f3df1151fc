package graft.exec

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** FIFO paper-trading engine — rebuild of /root/reference/execution/
  * paper_trading_engine.py:201-2030: Kelly-capped position sizing
  * (:1040-1165), stop/target/time exits (:1603-1767), and the FIFO lot
  * allocator with provenance priority (live lots consumed before
  * synthetic, then by trade id; partial allocation) (:344-455).
  *
  * The engine is an order-dependent state machine, so it runs as a
  * per-ticker `flatMapGroups` over time-sorted events — batch backtests
  * parallelize across tickers; the streaming variant keeps the same
  * per-key state inside mapGroupsWithState (graft.streaming).
  */
object PortfolioEngine {

  final case class Config(
      initialCapital: Double = 10000.0,
      kellyCap: Double = 0.20,
      stopLossPct: Double = 0.05,
      takeProfitPct: Double = 0.10,
      maxHoldBars: Int = 20)

  /** One bar of engine input: price + that bar's signal action. */
  final case class Event(
      ticker: String,
      ts: java.sql.Timestamp,
      price: Double,
      action: String, // BUY | SELL | HOLD
      confidence: Double,
      isSynthetic: Boolean)

  /** An executed fill (open or close). Close rows carry the FIFO
    * allocations: one ExecRow per consumed lot (partial closes allowed). */
  final case class ExecRow(
      ticker: String,
      ts: java.sql.Timestamp,
      tradeId: Long,
      action: String,
      quantity: Double,
      price: Double,
      isClose: Boolean,
      entryTradeId: Long,     // -1 for opens
      pnl: Double,            // 0 for opens
      exitReason: String,     // "", SIGNAL, STOP_LOSS, TAKE_PROFIT, TIME
      isSynthetic: Boolean)

  private final case class Lot(tradeId: Long, qty: Double, price: Double,
      barIdx: Int, isSynthetic: Boolean)

  /** Pure per-ticker kernel: time-sorted events → fills. */
  def runTicker(events: Seq[Event], cfg: Config = Config()): Seq[ExecRow] = {
    if (events.isEmpty) return Seq.empty
    val ticker = events.head.ticker
    val out = mutable.ArrayBuffer.empty[ExecRow]
    val lots = mutable.ArrayBuffer.empty[Lot] // open long lots
    var cash = cfg.initialCapital
    var nextId = 1L

    def closeLots(ts: java.sql.Timestamp, price: Double, qtyToClose: Double,
        reason: String, isSynthetic: Boolean): Unit = {
      var remaining = qtyToClose
      // provenance-then-FIFO: live lots first, then synthetic; trade id
      // order inside each class (paper_trading_engine.py:344-414)
      val ordered = lots.sortBy(l => (l.isSynthetic, l.tradeId))
      ordered.foreach { lot =>
        if (remaining > 1e-12 && lot.qty > 1e-12) {
          val take = math.min(lot.qty, remaining)
          val pnl = (price - lot.price) * take
          out += ExecRow(ticker, ts, nextId, "SELL", take, price,
            isClose = true, lot.tradeId, pnl, reason, isSynthetic)
          nextId += 1
          cash += take * price
          remaining -= take
          val i = lots.indexWhere(_.tradeId == lot.tradeId)
          if (lot.qty - take <= 1e-12) lots.remove(i)
          else lots(i) = lot.copy(qty = lot.qty - take)
        }
      }
    }

    events.zipWithIndex.foreach { case (ev, barIdx) =>
      // Exit evaluation happens BEFORE new entries (reference order,
      // execute_signal → _evaluate_exits first). The reference evaluates
      // exits at TICKER level (_evaluate_exit_reason:1603-1767 reads the
      // single per-ticker stop/target/entry state) and a trigger closes the
      // entire position, with stop checked before target before time
      // (:1667-1683). Mirror that here: scan live lots for triggers,
      // prioritize STOP_LOSS > TAKE_PROFIT > TIME across the position,
      // then close ALL open quantity under that one reason.
      if (lots.nonEmpty) {
        var sawStop = false; var sawTarget = false; var sawTime = false
        lots.foreach { lot =>
          val ret = if (lot.price != 0) ev.price / lot.price - 1 else 0.0
          val held = barIdx - lot.barIdx
          if (ret <= -cfg.stopLossPct) sawStop = true
          else if (ret >= cfg.takeProfitPct) sawTarget = true
          else if (held >= cfg.maxHoldBars) sawTime = true
        }
        val reason =
          if (sawStop) "STOP_LOSS"
          else if (sawTarget) "TAKE_PROFIT"
          else if (sawTime) "TIME"
          else ""
        if (reason.nonEmpty)
          closeLots(ev.ts, ev.price, lots.map(_.qty).sum, reason, ev.isSynthetic)
      }
      ev.action match {
        case "BUY" =>
          val positionValue = lots.map(l => l.qty * l.price).sum
          val equity = cash + positionValue
          val frac = math.min(cfg.kellyCap, cfg.kellyCap * ev.confidence)
          val budget = math.min(cash, equity * frac)
          val qty = if (ev.price > 0) budget / ev.price else 0.0
          if (qty > 1e-9) {
            out += ExecRow(ev.ticker, ev.ts, nextId, "BUY", qty, ev.price,
              isClose = false, -1L, 0.0, "", ev.isSynthetic)
            lots += Lot(nextId, qty, ev.price, barIdx, ev.isSynthetic)
            nextId += 1
            cash -= qty * ev.price
          }
        case "SELL" if lots.nonEmpty =>
          closeLots(ev.ts, ev.price, lots.map(_.qty).sum, "SIGNAL", ev.isSynthetic)
        case _ => ()
      }
    }
    out.toSeq
  }

  /** Distributed backtest: event frame → fills, one task per ticker. */
  def backtest(events: DataFrame, cfg: Config = Config()): Dataset[ExecRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("ticker"), col("ts"), col("price"), col("action"),
        col("confidence"), col("isSynthetic"))
      .as[Event]
      .groupByKey(_.ticker)
      .flatMapGroups { (_, rows) =>
        runTicker(rows.toArray.sortBy(_.ts.getTime).toSeq, cfg).iterator
      }
  }
}
