package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.exec.PortfolioEngine
import graft.exec.PortfolioEngine.{EngineState, Event, ExecRow}
import graft.forecast.ForecastEngine
import graft.pipeline.AutoTrader
import graft.signals.{QuantGate, SignalGenerator}

/** The COMPLETE live trading cycle as one Structured Streaming pipeline:
  * bar stream → forecast → signal → quant gate → risk-mode entry gate →
  * FIFO engine → fills, the streaming form of the reference's polling
  * loop (scripts/run_auto_trader.py:3876-4200) and of
  * [[graft.pipeline.AutoTrader.run]]'s batch cycles.
  *
  * Spark permits ONE stateful operator per query, so the per-ticker
  * state object carries BOTH halves of the cycle: the rolling bar
  * history the forecaster reads (the batch loop re-derives it per cycle
  * from the bar table) and the [[EngineState]] the executor folds over.
  * The decision slice itself is [[AutoTrader.signalForHistory]] — the
  * SAME function the batch loop calls — so streaming-vs-batch parity is
  * structural, not coincidental (spec-asserted fill-for-fill anyway).
  *
  * Scale: state per ticker is O(histCap) doubles plus O(open lots) —
  * a few KB — so the state store holds the full book the same way
  * [[LivePortfolio]] does. Each micro-batch forecasts only tickers with
  * a NEW bar (one kernel call per new bar, as in the reference's
  * same-bar-gated cycle). Ordering follows [[LivePortfolio.fills]]'s
  * contract: sorted within the batch, in-order delivery across batches
  * (compose [[LivePortfolio.fillsOrdered]]'s buffer pattern if the
  * source can reorder); a bar at-or-before the ticker's last seen bar
  * is dropped — the same-bar gate (run_auto_trader.py:3970-3990).
  */
object LiveCycle {

  final case class Bar(ticker: String, ts: java.sql.Timestamp,
      close: Double, high: Double, low: Double)

  /** Total bar order: (ms, nanos, close) — the bar analog of
    * [[graft.exec.PortfolioEngine.eventKey]]. An ms-only sort leaves
    * two same-ms bars in shuffle order, so which one survives the
    * same-bar gate would differ across checkpoint replays; the close
    * tiebreak makes the survivor deterministic (and the batch loop
    * sorts by the same key, so stream/batch parity holds for tied
    * timestamps too). */
  def barKey(b: Bar): (Long, Int, Double) =
    (b.ts.getTime, b.ts.getNanos, b.close)

  /** Rolling history (ms-epoch, close, high, low) + engine state. */
  final case class CycleState(
      hist: Seq[(Long, Double, Double, Double)],
      engine: EngineState)

  /** bars (streaming) → fills. `minBars`: trade only once a ticker has
    * this much history (the batch loop's warmup: its first cycle sees
    * `dates − cycles + 1` bars). `histCap` bounds state growth; keep it
    * ≥ the forecaster's effective lookback or long-history parity with
    * an uncapped batch run decays (default 4096 daily bars ≈ 16 years).
    */
  /** Shared per-ticker fold: ordered bars through same-bar gate →
    * history append → [[AutoTrader.signalForHistory]] → risk-mode entry
    * gate → engine step. Both the in-order and the reorder-buffered
    * variants run exactly this. */
  private def foldBars(ticker: String, ordered: Seq[Bar], st0: CycleState,
      minBars: Int, histCap: Int, fcCfg: ForecastEngine.Config,
      sigCfg: SignalGenerator.Config, engineCfg: PortfolioEngine.Config,
      gateCfg: Option[QuantGate.Config],
      riskMode: Option[AutoTrader.RiskPolicy],
      effCfg: PortfolioEngine.Config): (CycleState, Seq[ExecRow]) = {
    var st = st0
    val out = Seq.newBuilder[ExecRow]
    ordered.foreach { b =>
      val lastTs = st.hist.lastOption.map(_._1).getOrElse(Long.MinValue)
      if (b.ts.getTime > lastTs) { // same-bar gate
        val hist = (st.hist :+ ((b.ts.getTime, b.close, b.high, b.low)))
          .takeRight(histCap)
        var eng = st.engine
        if (hist.length >= minBars) {
          val arr = hist.map { case (ms, c, h, l) =>
            (new java.sql.Timestamp(ms), c, h, l)
          }.toArray
          AutoTrader.signalForHistory(ticker, arr, fcCfg, sigCfg,
              gateCfg, engineCfg).foreach {
            case (ts, price, action0, conf, atr) =>
              // risk-mode entry gate, same rule as the batch loop's
              // column transform: sub-threshold BUY/SELL → HOLD
              val action = riskMode match {
                case Some(p) if action0 != "HOLD" &&
                  conf < p.minSignalConfidence => "HOLD"
                case _ => action0
              }
              val (e2, fs) = PortfolioEngine.step(eng,
                Event(ticker, ts, price, action, conf,
                  isSynthetic = false, atr = atr), effCfg)
              eng = e2
              out ++= fs
          }
        }
        st = CycleState(hist, eng)
      }
    }
    (st, out.result())
  }

  def fills(bars: Dataset[Bar], minBars: Int,
      fcCfg: ForecastEngine.Config = ForecastEngine.Config(horizon = 5, mcPaths = 100),
      sigCfg: SignalGenerator.Config = SignalGenerator.Config(),
      engineCfg: PortfolioEngine.Config = PortfolioEngine.Config(),
      gateCfg: Option[QuantGate.Config] = Some(QuantGate.Config()),
      riskMode: Option[AutoTrader.RiskPolicy] = None,
      histCap: Int = 4096): Dataset[ExecRow] = {
    import bars.sparkSession.implicits._
    val effCfg = riskMode.fold(engineCfg)(_.engine(engineCfg))
    bars
      .groupByKey(_.ticker)
      .flatMapGroupsWithState[CycleState, ExecRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (ticker: String, rows: Iterator[Bar], state: GroupState[CycleState]) =>
          val st0 = state.getOption.getOrElse(
            CycleState(Vector.empty, EngineState.init(effCfg)))
          val (st, out) = foldBars(ticker, rows.toArray.sortBy(barKey).toSeq,
            st0, minBars, histCap, fcCfg, sigCfg, engineCfg, gateCfg,
            riskMode, effCfg)
          state.update(st)
          out.iterator
      }
  }

  /** [[CycleState]] plus the reorder buffer of the late-tolerant
    * variant — one state object so the whole cycle stays a single
    * stateful operator (see [[LivePortfolio.fillsOrdered]]). */
  final case class OrderedCycleState(
      buffered: Seq[Bar],
      hist: Seq[(Long, Double, Double, Double)],
      engine: EngineState)

  /** [[fills]] with the ordering contract enforced in code: bars buffer
    * per ticker and reach the cycle only in full event-time order once
    * the watermark (max event time − `delay`) passes them, so a feed
    * that reorders bars ACROSS micro-batches still matches the batch
    * auto-trader fill-for-fill. Bars at-or-before the last bar already
    * consumed are dropped (the same-bar gate generalized to late data);
    * an EventTimeTimeout at the earliest buffered bar drains quiescent
    * tickers without new input. */
  def fillsOrdered(bars: Dataset[Bar], minBars: Int, delay: String,
      fcCfg: ForecastEngine.Config = ForecastEngine.Config(horizon = 5, mcPaths = 100),
      sigCfg: SignalGenerator.Config = SignalGenerator.Config(),
      engineCfg: PortfolioEngine.Config = PortfolioEngine.Config(),
      gateCfg: Option[QuantGate.Config] = Some(QuantGate.Config()),
      riskMode: Option[AutoTrader.RiskPolicy] = None,
      histCap: Int = 4096): Dataset[ExecRow] = {
    import bars.sparkSession.implicits._
    val effCfg = riskMode.fold(engineCfg)(_.engine(engineCfg))
    bars
      .withWatermark("ts", delay)
      .groupByKey(_.ticker)
      .flatMapGroupsWithState[OrderedCycleState, ExecRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (ticker: String, rows: Iterator[Bar], state: GroupState[OrderedCycleState]) =>
          val st0 = state.getOption.getOrElse(
            OrderedCycleState(Seq.empty, Vector.empty, EngineState.init(effCfg)))
          val wm = state.getCurrentWatermarkMs()
          val (due, keep) = (st0.buffered ++ rows).partition(_.ts.getTime <= wm)
          val (st, out) = foldBars(ticker, due.sortBy(barKey),
            CycleState(st0.hist, st0.engine), minBars, histCap, fcCfg,
            sigCfg, engineCfg, gateCfg, riskMode, effCfg)
          state.update(OrderedCycleState(keep, st.hist, st.engine))
          // keep's timestamps are all > wm (partition above): legal
          // future timeout, fires when the watermark reaches it
          if (keep.nonEmpty) state.setTimeoutTimestamp(keep.map(_.ts.getTime).min)
          out.iterator
      }
  }
}
