package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.store.TradeViews
import Det._

/** The relational trade surface (SURVEY.md §2.11 / §2.3 views) exercised
  * through graft.store.TradeViews on a deterministic trade table derived
  * from `events`: purchases per user alternate open/close (odd row =
  * open, even row = close of the previous one), synthetic flag from
  * user_id. Every view is DuckDB-oracled with the same derivation CTE.
  */
object TradeQueries extends QueryModule {

  /** purchases → alternating open/close trades per user. Shared with
    * [[DashboardQueries]], which reads the same derived trade surface. */
  private[queries] def trades(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.load(s, dir, "events")
      .where($"event_type" === "purchase")
      .select($"event_id".as("trade_id"), $"user_id", $"ts", $"value".as("price"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id").orderBy($"ts", $"trade_id")))
      .withColumn("is_close", $"rn" % 2 === 0)
      .withColumn("entry_trade_id",
        lag($"trade_id", 1).over(Window.partitionBy($"user_id").orderBy($"rn")))
      .withColumn("action", when($"is_close", "SELL").otherwise("BUY"))
      .withColumn("pnl", when($"is_close",
        $"price" - lag($"price", 1).over(Window.partitionBy($"user_id").orderBy($"rn"))))
      .withColumn("is_synthetic", $"user_id" % 3 === 0)
      .withColumn("quantity", lit(1.0))
      .withColumn("ticker", concat(lit("U"), $"user_id"))
      .withColumn("entry_trade_id",
        when($"is_close", $"entry_trade_id").otherwise(lit(null)))
  }

  private[queries] val tradesSql =
    """WITH purchases AS (
      |  SELECT event_id AS trade_id, user_id, ts, value AS price,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events WHERE event_type = 'purchase'),
      |trades AS (
      |  SELECT trade_id, user_id, ts, price, rn,
      |    rn % 2 = 0 AS is_close,
      |    CASE WHEN rn % 2 = 0
      |      THEN lag(trade_id) OVER (PARTITION BY user_id ORDER BY rn) END AS entry_trade_id,
      |    CASE WHEN rn % 2 = 0
      |      THEN price - lag(price) OVER (PARTITION BY user_id ORDER BY rn) END AS pnl,
      |    user_id % 3 = 0 AS is_synthetic,
      |    1.0 AS quantity,
      |    'U' || CAST(user_id AS VARCHAR) AS ticker
      |  FROM purchases)""".stripMargin

  override def queries: Map[String, QFn] = Map(
    // round_trips view: closes LEFT JOIN opener (database_manager :1405-1430)
    "q70_round_trips" -> ((s, dir) => {
      import s.implicits._
      TradeViews.roundTrips(trades(s, dir))
        .select($"trade_id", $"ticker", $"entry_price",
          $"exit_price", $"pnl", $"entry_synthetic")
    }),

    // production_closed_trades: anti-join on synthetic openers (:1367-1382)
    "q71_production_closes" -> ((s, dir) => {
      import s.implicits._
      TradeViews.productionClosedTrades(trades(s, dir))
        .select($"trade_id", $"ticker", $"pnl")
    }),

    // canonical performance summary (:3417-3480)
    "q72_trade_perf" -> ((s, dir) => {
      TradeViews.performanceSummary(
        trades(s, dir).where(col("is_close")))
    }),

    // running realized-PnL equity curve (:3240-3273)
    "q73_equity_curve" -> ((s, dir) => {
      import s.implicits._
      TradeViews.equityCurve(trades(s, dir).where(col("is_close")))
        .select($"ticker", $"trade_id", $"equity")
    }),

    // Dashboard bridge: latest-run lookup (dashboard_db_bridge.py:357-366
    // `ORDER BY created_at DESC, id DESC LIMIT 1`) — run_id derived as
    // the trade's day bucket. TakeOrderedAndProject: no full sort at scale.
    "q91_latest_run" -> ((s, dir) => {
      import s.implicits._
      trades(s, dir)
        .withColumn("run_id", date_format(date_trunc("day", $"ts"), "yyyy-MM-dd"))
        .orderBy($"ts".desc, $"trade_id".desc).limit(1)
        .select($"run_id", $"trade_id")
    }),

    // Dashboard bridge: provenance census (dashboard_db_bridge.py:382-403
    // `SELECT source, COUNT(*) ... GROUP BY source`) over the trade
    // surface's provenance flag.
    "q92_provenance_counts" -> ((s, dir) => {
      import s.implicits._
      trades(s, dir)
        .withColumn("data_source",
          when($"is_synthetic", "synthetic").otherwise("live"))
        .groupBy($"data_source").agg(count(lit(1)).as("n"))
    }),

    // Dashboard bridge: open-positions snapshot (the portfolio_positions
    // read, dashboard_db_bridge.py:2190-2194): opens whose trade never
    // closed — LEFT ANTI against the close linkage — rolled up per ticker.
    "q94_open_positions" -> ((s, dir) => {
      import s.implicits._
      val t = trades(s, dir)
      val closed = t.where($"is_close").select($"entry_trade_id".as("cid"))
      t.where(!$"is_close")
        .join(closed, $"trade_id" === $"cid", "left_anti")
        .groupBy($"ticker").agg(
          count(lit(1)).as("n_open"),
          dsum($"price" * $"quantity").as("exposure"))
    }),

    // Dashboard bridge: action mix + the "no exits recorded" health flag
    // (dashboard_db_bridge.py:2197-2203).
    "q93_action_counts" -> ((s, dir) => {
      import s.implicits._
      val counts = trades(s, dir).groupBy($"action").agg(count(lit(1)).as("n"))
      // the health flag needs the total SELL count next to every row —
      // a broadcast cross-join of the ONE-ROW aggregate, not a
      // single-partition window (no WindowExec WARN, same result)
      val sells = counts.agg(
        sum(when($"action" === "SELL", $"n").otherwise(0L)).as("_sells"))
      counts.crossJoin(broadcast(sells))
        .withColumn("only_buys_flag",
          ($"_sells" === 0 && $"action" === "BUY").cast("int"))
        .drop("_sells")
    })
  )

  override def oracles: Map[String, String] = Map(
    "q70_round_trips" ->
      s"""$tradesSql
         |SELECT c.trade_id, c.ticker,
         |  COALESCE(o.price, c.price) AS entry_price,
         |  c.price AS exit_price, c.pnl,
         |  COALESCE(o.is_synthetic, FALSE) AS entry_synthetic
         |FROM trades c LEFT JOIN trades o
         |  ON c.entry_trade_id = o.trade_id AND NOT o.is_close
         |WHERE c.is_close""".stripMargin,
    "q71_production_closes" ->
      s"""$tradesSql
         |SELECT t.trade_id, t.ticker, t.pnl
         |FROM trades t
         |WHERE t.is_close AND NOT EXISTS (
         |  SELECT 1 FROM trades o
         |  WHERE o.trade_id = t.entry_trade_id AND NOT o.is_close
         |    AND o.is_synthetic)""".stripMargin,
    "q72_trade_perf" -> {
      val wins = "CAST(SUM(CAST(CASE WHEN pnl > 0 THEN pnl ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)"
      val losses = "CAST(SUM(CAST(CASE WHEN pnl < 0 THEN pnl ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)"
      s"""$tradesSql
         |SELECT COUNT(*) AS n_trades,
         |  ${sqlSum("pnl")} AS total_pnl,
         |  CAST(SUM(CASE WHEN pnl > 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS win_rate,
         |  CASE WHEN abs($losses) > 0 THEN $wins / abs($losses) END AS profit_factor,
         |  CASE WHEN SUM(CASE WHEN pnl > 0 THEN 1 ELSE 0 END) > 0
         |    THEN $wins / SUM(CASE WHEN pnl > 0 THEN 1 ELSE 0 END) END AS avg_win,
         |  CASE WHEN SUM(CASE WHEN pnl < 0 THEN 1 ELSE 0 END) > 0
         |    THEN $losses / SUM(CASE WHEN pnl < 0 THEN 1 ELSE 0 END) END AS avg_loss,
         |  MAX(pnl) AS largest_win,
         |  MIN(pnl) AS largest_loss
         |FROM trades WHERE is_close""".stripMargin
    },
    "q73_equity_curve" ->
      s"""$tradesSql
         |SELECT ticker, trade_id,
         |  CAST(SUM(CAST(pnl AS DECIMAL(38,6))) OVER (
         |    PARTITION BY ticker ORDER BY ts, trade_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS equity
         |FROM trades WHERE is_close""".stripMargin,
    "q91_latest_run" ->
      s"""$tradesSql
         |SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS run_id, trade_id
         |FROM trades
         |ORDER BY ts DESC, trade_id DESC
         |LIMIT 1""".stripMargin,
    "q92_provenance_counts" ->
      s"""$tradesSql
         |SELECT CASE WHEN is_synthetic THEN 'synthetic' ELSE 'live' END AS data_source,
         |  COUNT(*) AS n
         |FROM trades
         |GROUP BY 1""".stripMargin,
    "q94_open_positions" ->
      s"""$tradesSql
         |SELECT t.ticker, COUNT(*) AS n_open,
         |  ${sqlSum("t.price * t.quantity")} AS exposure
         |FROM trades t
         |WHERE NOT t.is_close AND NOT EXISTS (
         |  SELECT 1 FROM trades c
         |  WHERE c.is_close AND c.entry_trade_id = t.trade_id)
         |GROUP BY t.ticker""".stripMargin,
    "q93_action_counts" ->
      s"""$tradesSql,
         |counts AS (
         |  SELECT CASE WHEN is_close THEN 'SELL' ELSE 'BUY' END AS action,
         |    COUNT(*) AS n
         |  FROM trades GROUP BY 1),
         |sells AS (
         |  SELECT SUM(CASE WHEN action = 'SELL' THEN n ELSE 0 END) AS _sells
         |  FROM counts)
         |SELECT action, n,
         |  CAST(CASE WHEN _sells = 0 AND action = 'BUY' THEN 1 ELSE 0 END AS INT)
         |    AS only_buys_flag
         |FROM counts CROSS JOIN sells""".stripMargin
  )
}
