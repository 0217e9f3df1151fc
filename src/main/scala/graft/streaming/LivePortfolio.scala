package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.exec.PortfolioEngine
import graft.exec.PortfolioEngine.{Config, EngineState, Event, ExecRow}

/** Streaming live-mode portfolio engine — the Structured Streaming form
  * of the reference's live trading cycle (scripts/run_auto_trader.py:
  * 3876-4200 polling loop driving execution/paper_trading_engine.py:486
  * execute_signal), which holds per-ticker positions/stops/cash across
  * cycles exactly the way a state store holds keyed state across
  * micro-batches.
  *
  * The event logic is [[PortfolioEngine.step]] — the SAME kernel the
  * batch backtest folds over — so streaming output is fill-for-fill
  * identical to a batch run over the same event sequence (spec-asserted
  * parity). The state per key is one [[EngineState]]: O(open lots) per
  * ticker, which is what lets a 1000-executor cluster hold the whole
  * book — millions of tickers would still be a few hundred bytes each in
  * the state store, checkpointed and recoverable.
  *
  * Ordering contract: events are sorted by event time WITHIN each
  * micro-batch; ACROSS batches the source must not deliver a ticker's
  * events out of order (true of the reference's poll loop, and of any
  * log-compacted feed keyed by ticker). A late event would need an
  * explicit watermark + buffer stage in front ([[QuoteStream.barGate]]).
  */
object LivePortfolio {

  /** Fill stream → MERGE-upsert sink: the exactly-once persistence leg
    * of the live cycle (the reference INSERTs fills into
    * trade_executions per cycle; database_manager.py's executions
    * table). The engine's trade ids are deterministic per ticker (state
    * carries `nextId`), so (ticker, tradeId) is a natural idempotency
    * key — a checkpoint replay or restart re-emits the SAME rows and
    * the MERGE collapses them instead of double-counting fills.
    * Partitioned by fill date: a replay rewrites only the partitions it
    * touches. */
  def upsertFills(fills: Dataset[ExecRow], sink: graft.sources.MergeSink,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.{col, to_date}
    fills
      .withColumn("fill_date", to_date(col("ts")))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.upsert(batch): Unit
      }
      .start()
  }

  /** events (streaming Dataset) → fills, state held per ticker.
    * Append-mode output: each micro-batch emits only the fills its
    * events produced; positions/cash/stops carry over in the store. */
  def fills(events: Dataset[Event], cfg: Config = Config()): Dataset[ExecRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.ticker)
      .flatMapGroupsWithState[EngineState, ExecRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[Event], state: GroupState[EngineState]) =>
          var st = state.getOption.getOrElse(EngineState.init(cfg))
          val out = Seq.newBuilder[ExecRow]
          // sort within the batch by the engine's total event order
          // (full-precision ts + seq tiebreak — same key as the batch
          // backtest): micro-batch shuffle order is arbitrary, and a
          // ms-only key would make same-ms events replay-nondeterministic
          rows.toArray.sortBy(PortfolioEngine.eventKey).foreach { ev =>
            val (st1, fills) = PortfolioEngine.step(st, ev, cfg)
            st = st1
            out ++= fills
          }
          state.update(st)
          out.result().iterator
      }
  }
}
