package graft.exec

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import PortfolioEngine.{Config, Event}

/** Strategy parameter sweep — rebuild of /root/reference/etl/
  * strategy_optimizer.py:43-250 and backtesting/candidate_simulator.py:
  * candidate configs replayed through the engine, scored, top-k kept.
  *
  * Spark shape: the candidate grid × ticker set is the parallelism axis —
  * `crossJoin(broadcast(candidates))` then one `flatMapGroups` backtest
  * per (candidate, ticker) group, so a 1000-candidate sweep over a
  * 10k-ticker universe is 10M independent tasks-worth of work with NO
  * driver loop and no data duplication beyond the broadcast dim.
  */
object StrategyOptimizer {

  final case class Candidate(candId: Long, stopLossPct: Double,
      takeProfitPct: Double, kellyCap: Double)

  final case class CandidateScore(candId: Long, stopLossPct: Double,
      takeProfitPct: Double, kellyCap: Double, totalPnl: Double,
      nTrades: Long, maxDrawdown: Double, score: Double)

  /** Deterministic grid of candidate configs. */
  def grid(stops: Seq[Double], targets: Seq[Double], kellys: Seq[Double]): Seq[Candidate] =
    (for {
      (s, i) <- stops.zipWithIndex
      (t, j) <- targets.zipWithIndex
      (k, l) <- kellys.zipWithIndex
    } yield Candidate((i.toLong << 16) | (j.toLong << 8) | l.toLong, s, t, k)).toSeq

  /** Sweep: backtest every candidate on every ticker, aggregate per
    * candidate, score = pnl penalized by drawdown, return ranked.
    *
    * Determinism at scale: the equity curve is ordered by
    * (tsMillis, ticker, tradeId) — millisecond-only ordering left
    * same-ms fills across tickers shuffle-order-dependent — and
    * totalPnl is the FINAL point of the sequential cumulative curve
    * (max_by over the ordered row number) rather than an unordered
    * double SUM, so two runs of the same sweep produce bit-identical
    * scores on any cluster layout. */
  def sweep(events: DataFrame, candidates: Seq[Candidate], topK: Int = 10)
      : Dataset[CandidateScore] = {
    val spark = events.sparkSession
    import spark.implicits._
    val candDf = candidates.toDS()
    val joined = events
      .select(col("ticker"), col("ts"), col("price"), col("action"),
        col("confidence"), col("isSynthetic"))
      .crossJoin(broadcast(candDf))
    val fills = joined
      .as[(String, java.sql.Timestamp, Double, String, Double, Boolean,
        Long, Double, Double, Double)]
      .groupByKey(r => (r._7, r._1)) // (candId, ticker)
      .flatMapGroups { (key, rows) =>
        val arr = rows.toArray.sortBy(r => (r._2.getTime, r._2.getNanos))
        val cfg = Config(stopLossPct = arr.head._8, takeProfitPct = arr.head._9,
          kellyCap = arr.head._10)
        val evs = arr.map(r => Event(r._1, r._2, r._3, r._4, r._5, r._6)).toSeq
        PortfolioEngine.runTicker(evs, cfg).iterator.map(f =>
          (key._1, arr.head._8, arr.head._9, arr.head._10, f.pnl, f.isClose,
            f.ts.getTime, f.ticker, f.tradeId))
      }
    // per-candidate: total pnl, trades, max drawdown of the cumulative pnl
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("candId"))
      .orderBy(col("tsMillis"), col("ticker"), col("tradeId"))
    val wCum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val scored = fills.toDF("candId", "stop", "target", "kelly", "pnl",
        "isClose", "tsMillis", "ticker", "tradeId")
      .withColumn("cumPnl", sum(when(col("isClose"), col("pnl")).otherwise(0.0))
        .over(wCum))
      .withColumn("peak", max(col("cumPnl")).over(wCum))
      .withColumn("rnk", row_number().over(w))
      .groupBy(col("candId"), col("stop"), col("target"), col("kelly"))
      .agg(
        max_by(col("cumPnl"), col("rnk")).as("totalPnl"),
        sum(col("isClose").cast("long")).as("nTrades"),
        max(col("peak") - col("cumPnl")).as("maxDrawdown"))
      .withColumn("score",
        col("totalPnl") - lit(0.5) * coalesce(col("maxDrawdown"), lit(0.0)))
    scored.select(
        col("candId"), col("stop").as("stopLossPct"),
        col("target").as("takeProfitPct"), col("kelly").as("kellyCap"),
        col("totalPnl"), col("nTrades"), col("maxDrawdown"), col("score"))
      .as[CandidateScore]
      .orderBy(desc("score")).limit(topK)
  }
}
