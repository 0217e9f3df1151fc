package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming rebuild of the reference's quasi-stream
  * (/root/reference/etl/real_time_extractor.py:58-393 poll-loop +
  * rolling history + volatility alerts; scripts/run_auto_trader.py:
  * 3970-3990 same-bar dedup gate).
  *
  * Design: event-time processing with watermarks (the poll model of the
  * reference cannot be late; a real feed can, so late data is bounded
  * explicitly); per-ticker alert state is an EWMA variance — O(1) state
  * per key, which is what lets a 1000-executor cluster hold millions of
  * keys in the state store.
  */
object QuoteStream {

  final case class Quote(ticker: String, ts: java.sql.Timestamp, price: Double)
  final case class Alert(ticker: String, ts: java.sql.Timestamp,
      price: Double, ret: Double, sigma: Double)

  /** EWMA variance + last price per ticker (λ as in graft.forecast.Ewma). */
  final case class VolState(lastPrice: Double, ewmaVar: Double, nObs: Long)

  /** Same-bar dedup gate: one row per (ticker, bar), late data bounded
    * by the watermark (dropDuplicates keeps the first arrival). */
  def barGate(quotes: DataFrame, watermark: String = "10 minutes",
      barSeconds: Int = 60): DataFrame =
    quotes
      .withColumn("bar_ts",
        (floor(unix_timestamp(col("ts")) / barSeconds) * barSeconds)
          .cast("timestamp"))
      .withWatermark("bar_ts", watermark)
      .dropDuplicates("ticker", "bar_ts")

  /** Bar stream → MERGE-upsert sink, one idempotent upsert per
    * micro-batch: the streaming form of the reference's
    * `INSERT ... ON CONFLICT(ticker, date, source)` bars loop
    * (database_manager.py:1603-1687). [[barGate]] dedups within the
    * stream's state; the MergeSink key collapses what state cannot —
    * checkpoint replays and cross-restart duplicates — so the parquet
    * table converges to one row per (ticker, bar) no matter how often a
    * batch re-fires. Partitioned by bar date: a replay rewrites only the
    * partitions it touches. */
  def upsertBars(gated: DataFrame, sink: graft.sources.MergeSink,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    gated
      .withColumn("bar_date", to_date(col("bar_ts")))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.upsert(batch): Unit
      }
      .start()

  /** [[upsertBars]] against a [[graft.sources.VersionedTable]]: same
    * idempotent convergence, plus snapshot isolation — a reader NEVER
    * sees a half-applied micro-batch (the batch becomes visible only
    * when its single log-entry create lands), and `readAt` can replay
    * the table as of any earlier micro-batch for debugging/backtests. */
  def upsertBarsVersioned(gated: DataFrame, table: graft.sources.VersionedTable,
      keyCols: Seq[String], checkpoint: String, logCheckpointEvery: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery =
    gated
      .withColumn("bar_date", to_date(col("bar_ts")))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        table.upsert(batch, keyCols)
        // one log entry lands per micro-batch; periodic log checkpoints
        // keep snapshot resolution O(entries since checkpoint) instead of
        // O(total commits) on a long-running stream
        if (logCheckpointEvery > 0 && batchId > 0 && batchId % logCheckpointEvery == 0)
          table.checkpoint(): Unit
      }
      .start()

  /** Sliding event-time window aggregation over the quote stream. */
  def slidingStats(quotes: DataFrame, window_ : String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    quotes.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("ticker"))
      .agg(count(lit(1)).as("n"), avg(col("price")).as("mean_price"),
        stddev_samp(col("price")).as("std_price"))

  /** Per-ticker volatility-spike alerting with explicit EWMA state via
    * flatMapGroupsWithState — emits when |return| > k·σ_prev. */
  def volAlerts(quotes: Dataset[Quote], k: Double = 3.0, lambda: Double = 0.94,
      minObs: Int = 10): Dataset[Alert] = {
    val spark = quotes.sparkSession
    import spark.implicits._
    quotes.groupByKey(_.ticker)
      .flatMapGroupsWithState[VolState, Alert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (ticker: String, rows: Iterator[Quote], state: GroupState[VolState]) =>
          // event-time order within the batch (micro-batches preserve
          // per-key grouping, not order)
          val sorted = rows.toArray.sortBy(_.ts.getTime)
          var st = state.getOption.getOrElse(VolState(Double.NaN, 0.0, 0L))
          val alerts = scala.collection.mutable.ArrayBuffer.empty[Alert]
          sorted.foreach { q =>
            if (!st.lastPrice.isNaN && st.lastPrice != 0) {
              val r = q.price / st.lastPrice - 1
              val sigmaPrev = math.sqrt(st.ewmaVar)
              if (st.nObs >= minObs && sigmaPrev > 0 && math.abs(r) > k * sigmaPrev)
                alerts += Alert(ticker, q.ts, q.price, r, sigmaPrev)
              val v = if (st.nObs == 0) r * r
                else lambda * st.ewmaVar + (1 - lambda) * r * r
              st = VolState(q.price, v, st.nObs + 1)
            } else st = st.copy(lastPrice = q.price)
          }
          state.update(st)
          alerts.iterator
      }
  }
}
