package graft.exec

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** FIFO paper-trading engine — rebuild of /root/reference/execution/
  * paper_trading_engine.py:201-2030: Kelly-capped, regime-multiplied,
  * confidence-floored position sizing with a tighter short cap
  * (:1040-1165), slippage + market-impact entry simulation (:1328-1408),
  * long AND short positions, stop/target/time exits with the trailing
  * ATR stop ratchet (:1603-1767), and the FIFO lot allocator with
  * provenance priority (live lots consumed before synthetic, then by
  * trade id; partial allocation) (:344-455).
  *
  * The engine is an order-dependent state machine, so it runs as a
  * per-ticker `flatMapGroups` over time-sorted events — batch backtests
  * parallelize across tickers; the streaming variant keeps the same
  * per-key state inside mapGroupsWithState (graft.streaming).
  *
  * Position model (reference semantics): one-sided per ticker — a SELL
  * against a long position closes it (never flips short in the same
  * event), a BUY against a short covers it; SELL while flat opens a
  * short under the tighter `shortCap`. Stops/targets are POSITION-level
  * snapshots taken at the first entry from flat (the reference keys
  * stop_losses/entry_prices/entry_atrs by ticker), and the ratchet only
  * ever tightens them: long stops move up, short stops move down.
  */
object PortfolioEngine {

  final case class Config(
      initialCapital: Double = 10000.0,
      kellyCap: Double = 0.20,
      stopLossPct: Double = 0.05,
      takeProfitPct: Double = 0.10,
      maxHoldBars: Int = 20,
      // tighter cap for shorts (reference max_short_pct vs max_position_pct,
      // paper_trading_engine.py:1062-1106); 0 disables the short side
      shortCap: Double = 0.10,
      // confidence floor for sizing (reference conf_floor :1063,:1129)
      confFloor: Double = 0.0,
      // entry-simulation slippage (reference slippage_pct fallback model
      // :1402-1408). 0 = frictionless fills (the spec-exact mode); when
      // >0 every fill also pays size-proportional market impact
      // (orderValue/10000 * 1bp, the reference's fallback impact term).
      slippagePct: Double = 0.0)

  /** The reference's risk-mode presets (config/risk_mode.yml:38-40,
    * :82-84, :126-128 via paper_trading_engine.py:1060-1075): position
    * cap / short cap / confidence floor per operating mode, expressed on
    * a `base` Config. Production is strict (2%/1%, floor 0.50),
    * research_production balanced (5%/2%, floor 0.30), diagnostic loose
    * (10%/5%, floor 0.10). */
  object RiskMode {
    def production(base: Config = Config()): Config =
      base.copy(kellyCap = 0.02, shortCap = 0.01, confFloor = 0.50)
    def researchProduction(base: Config = Config()): Config =
      base.copy(kellyCap = 0.05, shortCap = 0.02, confFloor = 0.30)
    def diagnostic(base: Config = Config()): Config =
      base.copy(kellyCap = 0.10, shortCap = 0.05, confFloor = 0.10)
  }

  /** One bar of engine input: price + that bar's signal action.
    * `atr` is the entry-time ATR snapshot the trailing ratchet arms on
    * (0 = unknown → ratchet disabled, mirroring the reference's
    * missing-snapshot rule); `regimeRiskMult` scales the position cap
    * (reference _get_regime_risk_multiplier, :1093-1096). */
  final case class Event(
      ticker: String,
      ts: java.sql.Timestamp,
      price: Double,
      action: String, // BUY | SELL | HOLD
      confidence: Double,
      isSynthetic: Boolean,
      atr: Double = 0.0,
      regimeRiskMult: Double = 1.0,
      seq: Long = 0L) // monotonic source sequence; tiebreak for equal ts

  /** Total order on a ticker's events: full-precision event time
    * (getTime truncates to ms — getNanos breaks sub-ms ties), then the
    * source sequence id. Millisecond-only ordering made two same-ms
    * events shuffle-order-dependent, so a checkpoint replay could emit
    * different tradeIds than the original run and the (ticker, tradeId)
    * MERGE would double-count instead of collapsing. Both the batch
    * backtest and the streaming kernel sort by THIS key, which is what
    * makes fill-for-fill parity and exactly-once replay well-defined
    * even with tied timestamps. */
  def eventKey(ev: Event): (Long, Int, Long) =
    (ev.ts.getTime, ev.ts.getNanos, ev.seq)

  /** An executed fill (open or close). Close rows carry the FIFO
    * allocations: one ExecRow per consumed lot (partial closes allowed).
    * `side` is LONG or SHORT; short opens have action SELL and their
    * covers action BUY (the reference's sign convention). */
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
      isSynthetic: Boolean,
      side: String = "LONG")

  final case class Lot(tradeId: Long, qty: Double, price: Double,
      barIdx: Int, isSynthetic: Boolean)

  /** The engine's complete per-ticker state between events — everything
    * [[runTicker]] used to hold in local vars, lifted into a product so
    * the SAME kernel runs per-batch (fold over a sorted Seq) and
    * per-micro-batch (mapGroupsWithState holds it in the state store;
    * graft.streaming.LivePortfolio). `stopLevel`/`targetLevel` are NaN
    * while flat (the disarmed lifecycle). */
  final case class EngineState(
      cash: Double,
      nextId: Long,
      lots: List[Lot],
      shortLots: List[Lot],
      entryPrice: Double,
      entryAtr: Double,
      stopLevel: Double,
      targetLevel: Double,
      entryBar: Int,
      barIdx: Int)

  object EngineState {
    def init(cfg: Config): EngineState = EngineState(
      cash = cfg.initialCapital, nextId = 1L, lots = Nil, shortLots = Nil,
      entryPrice = 0.0, entryAtr = 0.0,
      stopLevel = Double.NaN, targetLevel = Double.NaN,
      entryBar = -1, barIdx = 0)
  }

  /** Pure per-ticker kernel: time-sorted events → fills. A fold over
    * [[step]] from the initial state — batch backtests and the
    * streaming live engine share every line of event logic. */
  def runTicker(events: Seq[Event], cfg: Config = Config()): Seq[ExecRow] = {
    if (events.isEmpty) return Seq.empty
    val out = mutable.ArrayBuffer.empty[ExecRow]
    events.foldLeft(EngineState.init(cfg)) { (st, ev) =>
      val (st1, fills) = step(st, ev, cfg)
      out ++= fills
      st1
    }
    out.toSeq
  }

  /** Advance the engine by ONE event: exits (ratchet → stop → target →
    * time), then the signal action — identical order and arithmetic to
    * the original closed-loop kernel. Returns the post-event state and
    * the fills the event produced. */
  def step(st: EngineState, ev: Event, cfg: Config): (EngineState, Seq[ExecRow]) = {
    val ticker = ev.ticker
    val barIdx = st.barIdx
    val out = mutable.ArrayBuffer.empty[ExecRow]
    val lots = mutable.ArrayBuffer.empty[Lot]      // open long lots
    val shortLots = mutable.ArrayBuffer.empty[Lot] // open short lots
    lots ++= st.lots
    shortLots ++= st.shortLots
    var cash = st.cash
    var nextId = st.nextId
    // position-level lifecycle snapshot (set on first entry from flat)
    var entryPrice = st.entryPrice
    var entryAtr = st.entryAtr
    var stopLevel = st.stopLevel
    var targetLevel = st.targetLevel
    var entryBar = st.entryBar

    // reference fallback fill model (:1402-1408): pct slippage plus
    // size-proportional impact; adverse on the aggressor's side
    def fill(raw: Double, qty: Double, buying: Boolean): Double = {
      if (cfg.slippagePct <= 0) return raw
      val impact = (qty * raw / 10000.0) * 0.0001
      val s = cfg.slippagePct + impact
      if (buying) raw * (1 + s) else raw * (1 - s)
    }

    def armLifecycle(price: Double, atr: Double, barIdx: Int, short: Boolean): Unit = {
      entryPrice = price
      entryAtr = math.max(0.0, atr)
      entryBar = barIdx
      if (short) {
        stopLevel = price * (1 + cfg.stopLossPct)
        targetLevel = price * (1 - cfg.takeProfitPct)
      } else {
        stopLevel = price * (1 - cfg.stopLossPct)
        targetLevel = price * (1 + cfg.takeProfitPct)
      }
    }

    def disarm(): Unit = {
      entryPrice = 0.0; entryAtr = 0.0; entryBar = -1
      stopLevel = Double.NaN; targetLevel = Double.NaN
    }

    def closeSide(book: mutable.ArrayBuffer[Lot], ts: java.sql.Timestamp,
        rawPrice: Double, qtyToClose: Double, reason: String,
        isSynthetic: Boolean, short: Boolean): Unit = {
      var remaining = qtyToClose
      // provenance-then-FIFO: live lots first, then synthetic; trade id
      // order inside each class (paper_trading_engine.py:344-414)
      val ordered = book.sortBy(l => (l.isSynthetic, l.tradeId)).toSeq
      val price = fill(rawPrice, qtyToClose, buying = short) // cover buys, long-close sells
      ordered.foreach { lot =>
        if (remaining > 1e-12 && lot.qty > 1e-12) {
          val take = math.min(lot.qty, remaining)
          val pnl =
            if (short) (lot.price - price) * take
            else (price - lot.price) * take
          out += ExecRow(ticker, ts, nextId, if (short) "BUY" else "SELL",
            take, price, isClose = true, lot.tradeId, pnl, reason, isSynthetic,
            side = if (short) "SHORT" else "LONG")
          nextId += 1
          // long close receives proceeds; a cover pays the market (the
          // short's proceeds were credited at open, so pnl is implicit)
          cash += (if (short) -take * price else take * price)
          remaining -= take
          val i = book.indexWhere(_.tradeId == lot.tradeId)
          if (lot.qty - take <= 1e-12) book.remove(i)
          else book(i) = lot.copy(qty = lot.qty - take)
        }
      }
      if (book.isEmpty) disarm()
    }

    // entry-basis equity: cash + long cost basis − short proceeds basis.
    // (The reference marks to market; entry basis keeps the kernel
    // deterministic w.r.t. only the event row and is the same at entry.)
    def equity: Double =
      cash + lots.map(l => l.qty * l.price).sum - shortLots.map(l => l.qty * l.price).sum

    locally {
      val short = shortLots.nonEmpty
      val book = if (short) shortLots else lots
      // Exit evaluation happens BEFORE new entries (reference order,
      // execute_signal → _evaluate_exits first), at POSITION level with
      // price exits checked before time (:1667-1683):
      //   1. trailing ATR ratchet may tighten the stop (:1634-1663)
      //   2. stop, then target, then time — one reason closes everything
      if (book.nonEmpty) {
        // ratchet: arms at >=1.0 ATR of profit (stop → entry), locks
        // gains at >=1.5 ATR (stop → entry ± 0.5 ATR); only tightens
        if (entryAtr > 0 && !stopLevel.isNaN) {
          if (!short) {
            val profit = ev.price - entryPrice
            val cand =
              if (profit >= 1.5 * entryAtr) entryPrice + 0.5 * entryAtr
              else if (profit >= 1.0 * entryAtr) entryPrice
              else Double.NaN
            if (!cand.isNaN && cand > stopLevel) stopLevel = cand
          } else {
            val profit = entryPrice - ev.price
            val cand =
              if (profit >= 1.5 * entryAtr) entryPrice - 0.5 * entryAtr
              else if (profit >= 1.0 * entryAtr) entryPrice
              else Double.NaN
            if (!cand.isNaN && cand < stopLevel) stopLevel = cand
          }
        }
        val held = if (entryBar >= 0) barIdx - entryBar else 0
        val reason =
          if (!short && ev.price <= stopLevel) "STOP_LOSS"
          else if (short && ev.price >= stopLevel) "STOP_LOSS"
          else if (!short && ev.price >= targetLevel) "TAKE_PROFIT"
          else if (short && ev.price <= targetLevel) "TAKE_PROFIT"
          else if (held >= cfg.maxHoldBars) "TIME"
          else ""
        if (reason.nonEmpty)
          closeSide(book, ev.ts, ev.price, book.map(_.qty).sum, reason,
            ev.isSynthetic, short)
      }
      ev.action match {
        case "BUY" if shortLots.nonEmpty =>
          // covering a short never flips long in the same event (:1100-1106)
          closeSide(shortLots, ev.ts, ev.price, shortLots.map(_.qty).sum,
            "SIGNAL", ev.isSynthetic, short = true)
        case "BUY" =>
          val confW = math.max(ev.confidence, cfg.confFloor)
          val frac = math.min(cfg.kellyCap, cfg.kellyCap * confW)
          val budget = math.min(cash,
            equity * frac * math.max(0.0, ev.regimeRiskMult))
          val qty0 = if (ev.price > 0) budget / ev.price else 0.0
          // the fill price exceeds the sizing price under slippage, so
          // cap the quantity at what CASH can pay at the fill — sizing
          // from the raw price and debiting the slipped one would
          // overdraw a cash-bound account (px is computed at qty0, an
          // upper bound: shrinking qty only lowers impact)
          val px0 = if (qty0 > 0) fill(ev.price, qty0, buying = true) else 0.0
          val qty = if (px0 > 0) math.min(qty0, cash / px0) else 0.0
          if (qty > 1e-9) {
            val px = px0
            if (lots.isEmpty) armLifecycle(px, ev.atr, barIdx, short = false)
            out += ExecRow(ev.ticker, ev.ts, nextId, "BUY", qty, px,
              isClose = false, -1L, 0.0, "", ev.isSynthetic, side = "LONG")
            lots += Lot(nextId, qty, px, barIdx, ev.isSynthetic)
            nextId += 1
            cash -= qty * px
          }
        case "SELL" if lots.nonEmpty =>
          closeSide(lots, ev.ts, ev.price, lots.map(_.qty).sum, "SIGNAL",
            ev.isSynthetic, short = false)
        case "SELL" if cfg.shortCap > 0 =>
          // flat + SELL → open a short under the tighter cap (:1068-1106)
          val confW = math.max(ev.confidence, cfg.confFloor)
          val frac = math.min(cfg.shortCap, cfg.shortCap * confW)
          val budget = equity * frac * math.max(0.0, ev.regimeRiskMult)
          val qty = if (ev.price > 0) budget / ev.price else 0.0
          if (qty > 1e-9) {
            val px = fill(ev.price, qty, buying = false)
            if (shortLots.isEmpty) armLifecycle(px, ev.atr, barIdx, short = true)
            out += ExecRow(ev.ticker, ev.ts, nextId, "SELL", qty, px,
              isClose = false, -1L, 0.0, "", ev.isSynthetic, side = "SHORT")
            shortLots += Lot(nextId, qty, px, barIdx, ev.isSynthetic)
            nextId += 1
            cash += qty * px // short-sale proceeds
          }
        case _ => ()
      }
    }
    (EngineState(cash, nextId, lots.toList, shortLots.toList,
      entryPrice, entryAtr, stopLevel, targetLevel, entryBar, barIdx + 1),
      out.toSeq)
  }

  /** Distributed backtest: event frame → fills, one task per ticker.
    * Accepts frames without the optional atr/regimeRiskMult columns. */
  def backtest(events: DataFrame, cfg: Config = Config()): Dataset[ExecRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    val withDefaults = Seq("atr" -> lit(0.0), "regimeRiskMult" -> lit(1.0),
        "seq" -> lit(0L))
      .foldLeft(events) { case (df, (c, d)) =>
        if (df.columns.contains(c)) df else df.withColumn(c, d)
      }
    withDefaults.select(col("ticker"), col("ts"), col("price"), col("action"),
        col("confidence"), col("isSynthetic"), col("atr"), col("regimeRiskMult"),
        col("seq"))
      .as[Event]
      .groupByKey(_.ticker)
      .flatMapGroups { (_, rows) =>
        runTicker(rows.toArray.sortBy(eventKey).toSeq, cfg).iterator
      }
  }
}
