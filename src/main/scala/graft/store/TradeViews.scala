package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Det._

/** The reference's relational trade surface as Spark SQL views over a
  * trades frame with columns (trade_id, ticker, ts, action, quantity,
  * price, is_close, entry_trade_id, pnl, is_synthetic, data_source) —
  * rebuilds of /root/reference/etl/database_manager.py:
  *  - round_trips view (:1405-1430): closes LEFT JOIN their opener
  *  - production_closed_trades (:1367-1382): closes whose opener is not
  *    synthetic (anti-join on the contaminating condition)
  *  - performance summary (:3417-3480): win_rate / profit_factor /
  *    avg & largest win/loss over closed trades
  *  - equity curve (:3240-3273): running cumulative realized PnL
  *
  * All dims here are small relative to the fact table, so the self-joins
  * broadcast; the equity curve is a per-ticker window cumsum.
  */
object TradeViews {

  /** Closes LEFT JOINed to their opening trade with COALESCE fallback. */
  def roundTrips(trades: DataFrame): DataFrame = {
    val closes = trades.where(col("is_close"))
    val opens = trades.where(!col("is_close")).select(
      col("trade_id").as("open_id"), col("price").as("entry_price"),
      col("ts").as("entry_ts"), col("is_synthetic").as("entry_synthetic"))
    closes.join(broadcast(opens), closes("entry_trade_id") === opens("open_id"), "left")
      .select(col("trade_id"), col("ticker"), col("ts").as("exit_ts"),
        col("entry_ts"),
        coalesce(col("entry_price"), col("price")).as("entry_price"),
        col("price").as("exit_price"), col("quantity"), col("pnl"),
        coalesce(col("entry_synthetic"), lit(false)).as("entry_synthetic"))
  }

  /** Closes whose opener exists and is NOT synthetic (NOT EXISTS arm). */
  def productionClosedTrades(trades: DataFrame): DataFrame = {
    val closes = trades.where(col("is_close"))
    val syntheticOpens = trades.where(!col("is_close") && col("is_synthetic"))
      .select(col("trade_id").as("open_id"))
    closes.join(broadcast(syntheticOpens),
      closes("entry_trade_id") === syntheticOpens("open_id"), "left_anti")
  }

  /** Canonical performance summary over (a view of) closed trades. */
  def performanceSummary(closes: DataFrame): DataFrame = {
    val pnl = col("pnl")
    val wins = sum(when(pnl > 0, pnl).otherwise(lit(0.0)).cast("decimal(38,6)")).cast("double")
    val losses = sum(when(pnl < 0, pnl).otherwise(lit(0.0)).cast("decimal(38,6)")).cast("double")
    val nWin = sum(when(pnl > 0, 1).otherwise(0))
    val nLoss = sum(when(pnl < 0, 1).otherwise(0))
    closes.agg(
      count(lit(1)).as("n_trades"),
      dsum(pnl).as("total_pnl"),
      (nWin.cast("double") / count(lit(1))).as("win_rate"),
      when(abs(losses) > 0, wins / abs(losses)).as("profit_factor"),
      when(nWin > 0, wins / nWin).as("avg_win"),
      when(nLoss > 0, losses / nLoss).as("avg_loss"),
      max(pnl).as("largest_win"),
      min(pnl).as("largest_loss"))
  }

  /** Running realized-PnL equity curve per ticker. */
  def equityCurve(closes: DataFrame): DataFrame = {
    val w = Window.partitionBy("ticker").orderBy(col("ts"), col("trade_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    closes.select(col("ticker"), col("ts"), col("trade_id"),
      sum(col("pnl").cast("decimal(38,6)")).over(w).cast("double").as("equity"))
  }
}
