package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Det._

/** Dashboard DB-bridge read catalog (SURVEY.md §2.11 "Dashboard DB
  * bridge") — the reference serves a ~40-query read surface from
  * `scripts/dashboard_db_bridge.py`; this module oracles the reads that
  * were previously pattern-covered only. Like [[TradeQueries]], the
  * relational surfaces (trades, signals, quality snapshots, positions)
  * are deterministic derivations from the `events` table so every read
  * is DuckDB-oracle-checkable with the same derivation CTE.
  *
  * Scale notes: every "latest X" read is either a TakeOrderedAndProject
  * (global LIMIT) or a per-ticker row_number window partitioned on the
  * group key — no global sorts, no collects. The run-level equity roll-up
  * (q109) windows over the PER-RUN aggregate (one row per day), so the
  * single-partition window input is dim-sized, not fact-sized.
  */
object DashboardQueries extends QueryModule {

  /** trading_signals analog: clicks → one signal per event
    * (dashboard_db_bridge.py:769 column list). ~1/7 of rows get a NULL
    * signal_timestamp to exercise the bridge's COALESCE ordering. */
  private def signals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.load(s, dir, "events")
      .where($"event_type" === "click")
      .select(
        $"event_id".as("id"),
        concat(lit("U"), $"user_id").as("ticker"),
        when($"value" >= 10.0, "BUY").otherwise("SELL").as("action"),
        least($"value" / 20.0, lit(1.0)).as("confidence"),
        ($"value" / 100.0 - 0.05).as("expected_return"),
        when($"user_id" % 3 === 0, "synthetic").otherwise("live").as("source"),
        when($"event_id" % 7 === 0, lit(null).cast("timestamp"))
          .otherwise($"ts").as("signal_timestamp"),
        $"ts".as("created_at"))
  }

  private val signalsSql =
    """signals AS (
      |  SELECT event_id AS id,
      |    'U' || CAST(user_id AS VARCHAR) AS ticker,
      |    CASE WHEN value >= 10.0 THEN 'BUY' ELSE 'SELL' END AS action,
      |    least(value / 20.0, 1.0) AS confidence,
      |    value / 100.0 - 0.05 AS expected_return,
      |    CASE WHEN user_id % 3 = 0 THEN 'synthetic' ELSE 'live' END AS source,
      |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE ts END AS signal_timestamp,
      |    ts AS created_at
      |  FROM events WHERE event_type = 'click')""".stripMargin

  /** ohlcv-ish per-ticker price rows: purchases → (ticker, ts, close). */
  private def closes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.load(s, dir, "events")
      .where($"event_type" === "purchase")
      .select($"event_id", concat(lit("U"), $"user_id").as("ticker"),
        $"ts", $"value".as("close"))
  }

  private val closesSql =
    """closes AS (
      |  SELECT event_id, 'U' || CAST(user_id AS VARCHAR) AS ticker,
      |    ts, value AS close
      |  FROM events WHERE event_type = 'purchase')""".stripMargin

  /** data_quality_snapshots analog: per (ticker, day) profile over all
    * events (dashboard_db_bridge.py:711 column list). `source` is
    * functionally dependent on ticker (= user), so adding it to the
    * group key changes no cardinality. */
  private def quality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.load(s, dir, "events")
      .groupBy(
        concat(lit("U"), $"user_id").as("ticker"),
        date_trunc("day", $"ts").as("snap_date"),
        when($"user_id" % 3 === 0, "synthetic").otherwise("live").as("source"))
      .agg(
        davg($"value").as("quality_score"),
        (sum(when($"value" < 1.0, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("missing_pct"),
        (count(lit(1)).cast("double") / 48.0).as("coverage"),
        (sum(when($"value" > 30.0, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("outlier_frac"))
  }

  private val qualitySql =
    s"""quality AS (
       |  SELECT 'U' || CAST(user_id AS VARCHAR) AS ticker,
       |    date_trunc('day', ts) AS snap_date,
       |    CASE WHEN user_id % 3 = 0 THEN 'synthetic' ELSE 'live' END AS source,
       |    ${sqlAvg("value")} AS quality_score,
       |    CAST(SUM(CASE WHEN value < 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
       |      / COUNT(*) AS missing_pct,
       |    CAST(COUNT(*) AS DOUBLE) / 48.0 AS coverage,
       |    CAST(SUM(CASE WHEN value > 30.0 THEN 1 ELSE 0 END) AS DOUBLE)
       |      / COUNT(*) AS outlier_frac
       |  FROM events
       |  GROUP BY 1, 2, 3)""".stripMargin

  /** time_series_forecasts analog (dashboard_db_bridge.py:2156 column
    * list): one forecast row per click event; ~1/5 rows carry NULL
    * params to exercise the bridge's IS NOT NULL arm. */
  private def forecasts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.load(s, dir, "events")
      .where($"event_type" === "click")
      .select(
        $"event_id".as("id"),
        concat(lit("U"), $"user_id").as("ticker"),
        when($"user_id" % 4 === 0, "SARIMAX")
          .when($"user_id" % 4 === 1, "GARCH")
          .when($"user_id" % 4 === 2, "SSA")
          .otherwise("ENSEMBLE").as("model_type"),
        when($"event_id" % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("{\"p\":"), ($"user_id" % 5).cast("string"),
            lit("}"))).as("params"),
        $"ts".as("created_at"))
  }

  private val forecastsSql =
    """forecasts AS (
      |  SELECT event_id AS id,
      |    'U' || CAST(user_id AS VARCHAR) AS ticker,
      |    CASE user_id % 4 WHEN 0 THEN 'SARIMAX' WHEN 1 THEN 'GARCH'
      |      WHEN 2 THEN 'SSA' ELSE 'ENSEMBLE' END AS model_type,
      |    CASE WHEN event_id % 5 = 0 THEN NULL
      |      ELSE '{"p":' || CAST(user_id % 5 AS VARCHAR) || '}' END AS params,
      |    ts AS created_at
      |  FROM events WHERE event_type = 'click')""".stripMargin

  /** The bridge's fixed dashboard ticker set (`IN (...)` filters). */
  private val tickerSet = Seq("U1", "U2", "U3", "U5", "U8")
  private val tickerSetSql = tickerSet.map("'" + _ + "'").mkString("(", ", ", ")")

  /** Positions-from-executions replay kernel (dashboard_db_bridge.py:
    * 598-660): input columns (ticker, ts, event_id, action, qty, price),
    * pre-filtered to BUY/SELL with qty > 0 and price > 0. One state
    * machine per ticker (sequential recurrence → flatMapGroups); output
    * is the OPEN book only, marked at the latest BUY price. */
  def replayPositions(execs: DataFrame): DataFrame = {
    val s = execs.sparkSession
    import s.implicits._
    execs.select(col("ticker"), col("ts"), col("event_id"), col("action"),
        col("qty"), col("price"))
      .as[(String, java.sql.Timestamp, Long, String, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (t, rows) =>
        // full-precision ts (getNanos breaks sub-ms ties) so the kernel
        // and the oracle's ORDER BY ts, event_id share one total order
        val arr = rows.toArray.sortBy(r => (r._2.getTime, r._2.getNanos, r._3))
        var shares = 0.0
        var entry: java.lang.Double = null
        var cur: java.lang.Double = null // latest purchase price
        arr.foreach { case (_, _, _, action, qty, price) =>
          if (action == "BUY") cur = price
          val sq = if (action == "BUY") qty else -qty
          if (shares == 0.0) { shares = sq; entry = price }
          else {
            val sameSide = (shares > 0) == (sq > 0)
            // entry computed from the PRE-update position (reference
            // order); parenthesization mirrors the oracle SQL exactly
            val newEntry: java.lang.Double =
              if (sameSide)
                (math.abs(shares) * entry + math.abs(sq) * price) /
                  (math.abs(shares) + math.abs(sq))
              else if (math.abs(sq) < math.abs(shares)) entry
              else if (math.abs(sq) == math.abs(shares)) null
              else price
            shares += sq
            entry = newEntry
          }
        }
        if (math.abs(shares) >= 1e-6) {
          val mv: Option[Double] =
            if (cur != null) Some(cur * shares) else None
          val unreal: Option[Double] =
            if (cur != null && entry != null && entry.doubleValue != 0.0)
              Some((cur / entry - 1.0) * (if (shares > 0) 1.0 else -1.0))
            else None
          Iterator((t, math.round(shares).toInt, Option(entry).map(_.doubleValue),
            Option(cur).map(_.doubleValue), mv, unreal))
        } else Iterator.empty
      }
      .toDF("ticker", "shares", "entry_price", "current_price",
        "market_value", "unrealized_pnl_pct")
  }

  /** The bridge's positions ROUTING (dashboard_db_bridge.py:473-486):
    * serve the snapshot at MAX(position_date) when one exists and is no
    * older than `maxAgeDays` relative to `asOf`; otherwise fall back to
    * the executions replay. Returns the frame plus the provenance tag
    * the reference reports ("portfolio_positions",
    * "trade_executions_fallback", "trade_executions_fallback_stale").
    * The MAX probe aggregates ONE row — never a fact-side collect. */
  def positionsRouted(positionsByDate: DataFrame, execs: DataFrame,
      asOf: java.sql.Timestamp, maxAgeDays: Double): (DataFrame, String) = {
    val latest = positionsByDate.agg(max(col("position_date"))).head().get(0)
    latest match {
      case null => (replayPositions(execs), "trade_executions_fallback")
      case d: java.util.Date => // Timestamp or Date column both qualify
        val ageDays = (asOf.getTime - d.getTime) / 86400000.0
        if (ageDays > maxAgeDays)
          (replayPositions(execs), "trade_executions_fallback_stale")
        else
          (positionsByDate.where(col("position_date") === lit(d)),
            "portfolio_positions")
      case other => throw new IllegalArgumentException(
        s"position_date must be a date/timestamp, got $other")
    }
  }

  override def queries: Map[String, QFn] = Map(
    // Ticker census: DISTINCT tickers across the bridge's surfaces
    // (dashboard_db_bridge.py:294, one query per table, merged) —
    // union the signal and trade surfaces, top-200 by name.
    "q100_ticker_census" -> ((s, dir) => {
      import s.implicits._
      signals(s, dir).select($"ticker")
        .union(TradeQueries.trades(s, dir).select($"ticker"))
        .distinct()
        .orderBy($"ticker").limit(200)
    }),

    // Synthetic dataset-id census (dashboard_db_bridge.py:408-411):
    // DISTINCT non-null non-empty dataset ids from the trade surface.
    "q101_dataset_census" -> ((s, dir) => {
      import s.implicits._
      TradeQueries.trades(s, dir)
        .withColumn("synthetic_dataset_id",
          when($"user_id" % 30 === 0, "")
            .when($"user_id" % 3 === 0, concat(lit("ds-"), $"user_id" % 5)))
        .where($"synthetic_dataset_id".isNotNull && $"synthetic_dataset_id" =!= "")
        .select($"synthetic_dataset_id").distinct()
    }),

    // Latest non-null run id (dashboard_db_bridge.py:357-366): unlike
    // q91 (latest trade's run), this read must skip trades with no run
    // id — ORDER BY ... LIMIT 1 over the non-null subset.
    "q102_latest_run_nonnull" -> ((s, dir) => {
      import s.implicits._
      TradeQueries.trades(s, dir)
        .withColumn("run_id",
          when($"user_id" % 7 === 0, lit(null).cast("string"))
            .otherwise(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd")))
        .where($"run_id".isNotNull)
        .orderBy($"ts".desc, $"trade_id".desc).limit(1)
        .select($"run_id", $"trade_id")
    }),

    // Positions snapshot at the latest position_date
    // (dashboard_db_bridge.py:473 MAX(position_date), then :487 the
    // per-ticker rows at that date). The max-date scalar is a broadcast
    // one-row cross join, not a window over the fact.
    "q103_positions_snapshot" -> ((s, dir) => {
      import s.implicits._
      val pos = closes(s, dir)
        .groupBy($"ticker", date_trunc("day", $"ts").as("position_date"))
        .agg(count(lit(1)).cast("double").as("shares"),
          davg($"close").as("average_cost"),
          dsum($"close").as("market_value"))
      val latest = pos.agg(max($"position_date").as("_maxd"))
      pos.crossJoin(broadcast(latest))
        .where($"position_date" === $"_maxd")
        .select($"ticker", $"shares", $"average_cost", $"market_value")
    }),

    // Latest close per ticker (dashboard_db_bridge.py:562-568, the
    // `ORDER BY date DESC LIMIT 1` per-ticker read) — row_number over
    // the ticker partition, never a global sort.
    "q104_latest_close" -> ((s, dir) => {
      import s.implicits._
      closes(s, dir)
        .withColumn("rn", row_number().over(
          Window.partitionBy($"ticker").orderBy($"ts".desc, $"event_id".desc)))
        .where($"rn" === 1)
        .select($"ticker", $"close")
    }),

    // Latest quality snapshot per ticker (dashboard_db_bridge.py:711-716).
    "q105_quality_latest" -> ((s, dir) => {
      import s.implicits._
      quality(s, dir)
        .withColumn("rn", row_number().over(
          Window.partitionBy($"ticker").orderBy($"snap_date".desc)))
        .where($"rn" === 1)
        .select($"ticker", $"quality_score", $"missing_pct",
          $"coverage", $"outlier_frac", $"source")
    }),

    // Recent price series per ticker (dashboard_db_bridge.py:738-744,
    // `ORDER BY date DESC LIMIT lookback*3` per ticker): last 30 closes.
    "q106_price_series" -> ((s, dir) => {
      import s.implicits._
      closes(s, dir)
        .withColumn("rn", row_number().over(
          Window.partitionBy($"ticker").orderBy($"ts".desc, $"event_id".desc)))
        .where($"rn" <= 30)
        .select($"ticker", $"ts", $"close")
    }),

    // Latest signals for the dashboard ticker set
    // (dashboard_db_bridge.py:769-776): COALESCE(signal_timestamp,
    // created_at) DESC, id DESC LIMIT 20 — TakeOrderedAndProject.
    "q107_latest_signals" -> ((s, dir) => {
      import s.implicits._
      signals(s, dir)
        .where($"ticker".isin(tickerSet: _*))
        .orderBy(coalesce($"signal_timestamp", $"created_at").desc, $"id".desc)
        .limit(20)
        .select($"id", $"ticker", $"action", $"confidence",
          $"expected_return", $"source", $"signal_timestamp")
    }),

    // Recent trades for the dashboard ticker set
    // (dashboard_db_bridge.py:836-839 preferred column list).
    "q108_recent_trades" -> ((s, dir) => {
      import s.implicits._
      TradeQueries.trades(s, dir)
        .where($"ticker".isin(tickerSet: _*))
        .orderBy($"ts".desc, $"trade_id".desc).limit(25)
        .select($"ticker", $"action", $"quantity".as("shares"), $"price",
          date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("trade_date"),
          $"ts".as("created_at"))
    }),

    // Equity curve BY RUN (the run-level roll-up the bridge renders):
    // per-run performance row + cumulative equity across runs. The
    // cumulative window's input is the per-run aggregate (a row per
    // day), so the unpartitioned window is dim-sized by construction.
    "q109_perf_by_run" -> ((s, dir) => {
      import s.implicits._
      val perRun = TradeQueries.trades(s, dir)
        .where($"is_close")
        .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("run_id"))
        .agg(count(lit(1)).as("num_trades"),
          dsum($"pnl").as("total_pnl"),
          (sum(when($"pnl" > 0, 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as("win_rate"))
      perRun.withColumn("equity",
        dsumOver($"total_pnl", Window.orderBy($"run_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }),

    // Positions-from-executions REPLAY (dashboard_db_bridge.py:598-660,
    // the `trade_executions_fallback` path): rebuild per-ticker position
    // state by replaying BUY/SELL executions in order — weighted-average
    // entry on same-side adds, entry carried through partial reductions,
    // reset on exact close, re-marked on side flips. A sequential
    // recurrence, so it runs as the engine's per-ticker flatMapGroups
    // kernel; the oracle replays the IDENTICAL IEEE operation sequence
    // with a DuckDB recursive CTE (the q47 pattern) — bit-exact compare,
    // no tolerance.
    "q113_positions_replay" -> ((s, dir) => {
      import s.implicits._
      replayPositions(graft.Tables.load(s, dir, "events")
        .where($"event_type".isin("purchase", "click") && $"value" > 0)
        .select(concat(lit("U"), $"user_id").as("ticker"), $"ts", $"event_id",
          when($"event_type" === "purchase", "BUY").otherwise("SELL").as("action"),
          ($"event_id" % 3 + 1).cast("double").as("qty"),
          $"value".as("price")))
    }),

    // Latest performance_metrics row (dashboard_db_bridge.py:918-935):
    // the canonical summary for the most recent run only.
    "q110_perf_latest" -> ((s, dir) => {
      import s.implicits._
      val closed = TradeQueries.trades(s, dir).where($"is_close")
        .withColumn("run_id",
          date_format(date_trunc("day", $"ts"), "yyyy-MM-dd"))
      val latest = closed.agg(max($"run_id").as("_maxr"))
      val wins = sum(when($"pnl" > 0, $"pnl").otherwise(0.0).cast("decimal(38,6)")).cast("double")
      val losses = sum(when($"pnl" < 0, $"pnl").otherwise(0.0).cast("decimal(38,6)")).cast("double")
      val nWins = sum(when($"pnl" > 0, 1L).otherwise(0L))
      val nLosses = sum(when($"pnl" < 0, 1L).otherwise(0L))
      closed.crossJoin(broadcast(latest))
        .where($"run_id" === $"_maxr")
        .groupBy($"run_id")
        .agg(count(lit(1)).as("num_trades"),
          dsum($"pnl").as("total_return"),
          (sum(when($"pnl" > 0, 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as("win_rate"),
          when(abs(losses) > 0, wins / abs(losses)).as("profit_factor"),
          when(nWins > 0, wins / nWins).as("avg_win"),
          when(nLosses > 0, losses / nLosses).as("avg_loss"),
          max($"pnl").as("largest_win"),
          min($"pnl").as("largest_loss"))
    }),

    // Classified trade events (dashboard_db_bridge.py:689-705 event
    // taxonomy + :808-842 filtered fetch): entry / exit_win / exit_loss
    // / exit, dashboard ticker set, latest 40.
    "q115_trade_events_classified" -> ((s, dir) => {
      import s.implicits._
      TradeQueries.trades(s, dir)
        .where($"ticker".isin(tickerSet: _*))
        .withColumn("event_class",
          when(!$"is_close", "entry")
            .when($"pnl" > 0, "exit_win")
            .when($"pnl" < 0, "exit_loss")
            .otherwise("exit"))
        .orderBy($"ts".desc, $"trade_id".desc).limit(40)
        .select($"ticker", $"action", $"event_class", $"price", $"pnl")
    }),

    // Latest model params (dashboard_db_bridge.py:2156-2163): newest 400
    // non-null param rows across tickers — a global TakeOrderedAndProject.
    "q116_model_params_latest" -> ((s, dir) => {
      import s.implicits._
      forecasts(s, dir)
        .where($"params".isNotNull)
        .orderBy($"created_at".desc, $"id".desc).limit(400)
        .select($"ticker", $"model_type", $"params", $"created_at")
    }),

    // Forecast history per ticker (the dashboard's per-ticker model
    // history panel): latest 10 forecast rows per dashboard ticker.
    "q117_forecast_history" -> ((s, dir) => {
      import s.implicits._
      forecasts(s, dir)
        .where($"ticker".isin(tickerSet: _*))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"ticker").orderBy($"created_at".desc, $"id".desc)))
        .where($"rn" <= 10)
        .select($"ticker", $"id", $"model_type", $"created_at")
    }),

    // Per-ticker equity detail: running realized-PnL equity over each
    // dashboard ticker's closed trades — window PARTITIONED on ticker
    // (never global), decimal-accumulated.
    "q118_equity_by_ticker" -> ((s, dir) => {
      import s.implicits._
      TradeQueries.trades(s, dir)
        .where($"is_close" && $"ticker".isin(tickerSet: _*))
        .withColumn("equity", dsumOver($"pnl",
          Window.partitionBy($"ticker").orderBy($"ts", $"trade_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"ticker", $"ts", $"trade_id", $"pnl", $"equity")
    }),

    // Data checks (dashboard_db_bridge.py:2190-2206): the bridge's
    // one-row diagnostics — position rows, action mix (the only-buys
    // trap), performance-row presence.
    "q119_data_checks" -> ((s, dir) => {
      import s.implicits._
      val t = TradeQueries.trades(s, dir)
      t.agg(
        count(lit(1)).as("n_trade_rows"),
        sum(when($"action" === "BUY", 1L).otherwise(0L)).as("n_buys"),
        sum(when($"action" === "SELL", 1L).otherwise(0L)).as("n_sells"),
        (sum(when($"action" === "BUY", 1L).otherwise(0L)) > 0 &&
          sum(when($"action" === "SELL", 1L).otherwise(0L)) === 0)
          .as("only_buys"),
        countDistinct(when($"is_close",
          date_format(date_trunc("day", $"ts"), "yyyy-MM-dd")))
          .as("n_perf_rows"))
    }),

    // Positions snapshot, MINIMAL projection (dashboard_db_bridge.py:
    // 491-494 — the fallback arm when the full column set is absent).
    "q120_positions_min" -> ((s, dir) => {
      import s.implicits._
      val pos = closes(s, dir)
        .groupBy($"ticker", date_trunc("day", $"ts").as("position_date"))
        .agg(count(lit(1)).cast("double").as("shares"),
          davg($"close").as("average_cost"))
      val latest = pos.agg(max($"position_date").as("_maxd"))
      pos.crossJoin(broadcast(latest))
        .where($"position_date" === $"_maxd")
        .select($"ticker", $"shares", $"average_cost")
    }),

    // OHLCV provenance census (dashboard_db_bridge.py:388-391):
    // source → row count over the price surface (q92 covers the trade
    // surface's provenance; this is the bars arm).
    "q121_ohlcv_provenance" -> ((s, dir) => {
      import s.implicits._
      closes(s, dir)
        .withColumn("source",
          when(substring($"ticker", 2, 10).cast("long") % 3 === 0,
            "synthetic").otherwise("live"))
        .groupBy($"source").agg(count(lit(1)).as("n"))
    }),

    // db_metadata key lookup (dashboard_db_bridge.py:370-374): the
    // bridge reads single values from a (key, value) metadata dim; the
    // dim here derives from the event table itself.
    "q122_db_metadata" -> ((s, dir) => {
      import s.implicits._
      graft.Tables.load(s, dir, "events")
        .agg(max($"ts").as("max_ts"), count(lit(1)).as("n"))
        .selectExpr(
          """stack(3,
            |  'last_ts', date_format(max_ts, 'yyyy-MM-dd HH:mm:ss'),
            |  'n_events', cast(n as string),
            |  'schema_version', 'v1') AS (key, value)""".stripMargin)
        .where($"key" === "last_ts")
        .limit(1)
    }),

    // Barbell bucket roll-up (dashboard_db_bridge.py:314-352): the
    // static ticker→bucket map applied to the trade surface, counted
    // per bucket.
    "q123_barbell_buckets" -> ((s, dir) => {
      import s.implicits._
      TradeQueries.trades(s, dir)
        .withColumn("bucket",
          when($"user_id" % 10 < 3, "aggressive_growth")
            .when($"user_id" % 10 < 6, "core")
            .otherwise("defensive_value"))
        .groupBy($"bucket")
        .agg(countDistinct($"ticker").as("n_tickers"),
          count(lit(1)).as("n_trades"))
    }),

    // Default ticker list (dashboard_db_bridge.py:268-294): the bridge
    // probes surfaces IN PRIORITY ORDER and serves the first non-empty
    // one's distinct tickers (signals first, trades as fallback).
    "q124_default_tickers" -> ((s, dir) => {
      import s.implicits._
      val u = signals(s, dir).select($"ticker").distinct()
        .withColumn("pri", lit(0))
        .union(TradeQueries.trades(s, dir).select($"ticker").distinct()
          .withColumn("pri", lit(1)))
      val top = u.agg(min($"pri").as("_minp"))
      u.crossJoin(broadcast(top)).where($"pri" === $"_minp")
        .select($"ticker").orderBy($"ticker").limit(200)
    }),

    // Provenance ORIGIN verdict (dashboard_db_bridge.py:426-446): the
    // one-row synthetic/live/mixed classification the payload serves,
    // over the q121/q92 provenance counts plus the q101 dataset-id
    // census. Three one-row aggregates broadcast-crossed — never a
    // fact-side join.
    "q140_provenance_origin" -> ((s, dir) => {
      import s.implicits._
      val oc = closes(s, dir).agg(
        sum(when(substring($"ticker", 2, 10).cast("long") % 3 === 0, 1L)
          .otherwise(0L)).as("n_ohlcv_synthetic"),
        sum(when(substring($"ticker", 2, 10).cast("long") % 3 =!= 0, 1L)
          .otherwise(0L)).as("n_ohlcv_live"))
      val tc = TradeQueries.trades(s, dir).agg(
        sum(when($"is_synthetic", 1L).otherwise(0L)).as("n_trade_synthetic"),
        sum(when(!$"is_synthetic", 1L).otherwise(0L)).as("n_trade_live"))
      val ds = TradeQueries.trades(s, dir)
        .withColumn("synthetic_dataset_id",
          when($"user_id" % 30 === 0, "")
            .when($"user_id" % 3 === 0, concat(lit("ds-"), $"user_id" % 5)))
        .where($"synthetic_dataset_id".isNotNull && $"synthetic_dataset_id" =!= "")
        .agg(countDistinct($"synthetic_dataset_id").as("n_dataset_ids"))
      oc.crossJoin(broadcast(tc)).crossJoin(broadcast(ds))
        .withColumn("_hs", $"n_ohlcv_synthetic" > 0 ||
          $"n_trade_synthetic" > 0 || $"n_dataset_ids" > 0)
        .withColumn("_hl", $"n_ohlcv_live" > 0 || $"n_trade_live" > 0)
        .select(
          when($"_hs" && $"_hl", "mixed")
            .when($"_hs", "synthetic").otherwise("live").as("origin"),
          $"n_ohlcv_synthetic", $"n_ohlcv_live",
          $"n_trade_synthetic", $"n_trade_live", $"n_dataset_ids")
    }),

    // Trade events filtered to the LATEST RUN (dashboard_db_bridge.py:
    // 824-828, the run_clause arm of :808's filtered fetch — q115 covers
    // the unfiltered arm): q102's latest-non-null-run scalar broadcast
    // onto the classified event feed, newest 40.
    "q141_trade_events_latest_run" -> ((s, dir) => {
      import s.implicits._
      val t = TradeQueries.trades(s, dir)
        .withColumn("run_id",
          when($"user_id" % 7 === 0, lit(null).cast("string"))
            .otherwise(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd")))
      val latest = t.where($"run_id".isNotNull)
        .orderBy($"ts".desc, $"trade_id".desc).limit(1)
        .select($"run_id".as("_run"))
      t.join(broadcast(latest), $"run_id" === $"_run")
        .where($"ticker".isin(tickerSet: _*))
        .withColumn("event_class",
          when(!$"is_close", "entry")
            .when($"pnl" > 0, "exit_win")
            .when($"pnl" < 0, "exit_loss")
            .otherwise("exit"))
        .orderBy($"ts".desc, $"trade_id".desc).limit(40)
        .select($"ticker", $"action", $"event_class", $"price", $"pnl",
          $"run_id")
    }),

    // Canonical PnL integrity metrics (dashboard_db_bridge.py:997-1036 →
    // integrity/pnl_integrity_enforcer.py:365-416): the q72 performance
    // shape restricted to PRODUCTION closes (synthetic-opener anti-join,
    // pnl non-null) plus the enforcer's exclusion counters. Loss
    // aggregates use the repo-wide pnl<0 convention (the enforcer's <=0
    // differs only on exact-zero pnl rows). One-row aggregates
    // broadcast-crossed.
    "q142_pnl_canonical" -> ((s, dir) => {
      import s.implicits._
      val t = TradeQueries.trades(s, dir)
      val synthOpens = t.where(!$"is_close" && $"is_synthetic")
        .select($"trade_id".as("open_id"))
      val prod = graft.store.TradeViews.productionClosedTrades(t)
        .where($"pnl".isNotNull)
      val excl = t.where($"is_close" && $"pnl".isNotNull)
        .join(broadcast(synthOpens), $"entry_trade_id" === $"open_id",
          "left_semi")
        .agg(count(lit(1)).as("synthetic_excluded"))
      val op = t.where(!$"is_close" && $"pnl".isNotNull)
        .agg(count(lit(1)).as("opening_legs_with_pnl"))
      val pnl = $"pnl"
      val wins = sum(when(pnl > 0, pnl).otherwise(lit(0.0))
        .cast("decimal(38,6)")).cast("double")
      val losses = sum(when(pnl < 0, pnl).otherwise(lit(0.0))
        .cast("decimal(38,6)")).cast("double")
      val nWin = sum(when(pnl > 0, 1).otherwise(0))
      val nLoss = sum(when(pnl < 0, 1).otherwise(0))
      prod.agg(
        count(lit(1)).as("trade_count"),
        dsum(pnl).as("total_realized_pnl"),
        (nWin.cast("double") / count(lit(1))).as("win_rate"),
        when(abs(losses) > 0, wins / abs(losses)).as("profit_factor"),
        when(nWin > 0, wins / nWin).as("avg_win"),
        when(nLoss > 0, losses / nLoss).as("avg_loss"),
        coalesce(max(when(pnl > 0, pnl)), lit(0.0)).as("largest_win"),
        coalesce(min(when(pnl < 0, pnl)), lit(0.0)).as("largest_loss"))
        .crossJoin(broadcast(excl))
        .crossJoin(broadcast(op))
    })
  )

  override def oracles: Map[String, String] = Map(
    "q100_ticker_census" ->
      s"""${TradeQueries.tradesSql},
         |$signalsSql
         |SELECT DISTINCT ticker FROM (
         |  SELECT ticker FROM signals
         |  UNION ALL SELECT ticker FROM trades)
         |ORDER BY ticker LIMIT 200""".stripMargin,
    "q101_dataset_census" ->
      s"""${TradeQueries.tradesSql},
         |sds AS (
         |  SELECT CASE WHEN user_id % 30 = 0 THEN ''
         |    WHEN user_id % 3 = 0 THEN 'ds-' || CAST(user_id % 5 AS VARCHAR)
         |  END AS synthetic_dataset_id
         |  FROM trades)
         |SELECT DISTINCT synthetic_dataset_id FROM sds
         |WHERE synthetic_dataset_id IS NOT NULL AND synthetic_dataset_id != ''""".stripMargin,
    "q102_latest_run_nonnull" ->
      s"""${TradeQueries.tradesSql},
         |runs AS (
         |  SELECT CASE WHEN user_id % 7 = 0 THEN NULL
         |    ELSE strftime(CAST(ts AS DATE), '%Y-%m-%d') END AS run_id,
         |    trade_id, ts
         |  FROM trades)
         |SELECT run_id, trade_id FROM runs
         |WHERE run_id IS NOT NULL
         |ORDER BY ts DESC, trade_id DESC LIMIT 1""".stripMargin,
    "q103_positions_snapshot" ->
      s"""WITH $closesSql,
         |pos AS (
         |  SELECT ticker, date_trunc('day', ts) AS position_date,
         |    CAST(COUNT(*) AS DOUBLE) AS shares,
         |    ${sqlAvg("close")} AS average_cost,
         |    ${sqlSum("close")} AS market_value
         |  FROM closes GROUP BY 1, 2)
         |SELECT ticker, shares, average_cost, market_value
         |FROM pos
         |WHERE position_date = (SELECT MAX(position_date) FROM pos)""".stripMargin,
    "q104_latest_close" ->
      s"""WITH $closesSql,
         |ranked AS (
         |  SELECT ticker, close, row_number() OVER (
         |    PARTITION BY ticker ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM closes)
         |SELECT ticker, close FROM ranked WHERE rn = 1""".stripMargin,
    "q105_quality_latest" ->
      s"""WITH $qualitySql,
         |ranked AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY ticker ORDER BY snap_date DESC) AS rn
         |  FROM quality)
         |SELECT ticker, quality_score, missing_pct, coverage, outlier_frac, source
         |FROM ranked WHERE rn = 1""".stripMargin,
    "q106_price_series" ->
      s"""WITH $closesSql,
         |ranked AS (
         |  SELECT ticker, ts, close, row_number() OVER (
         |    PARTITION BY ticker ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM closes)
         |SELECT ticker, ts, close FROM ranked WHERE rn <= 30""".stripMargin,
    "q107_latest_signals" ->
      s"""WITH $signalsSql
         |SELECT id, ticker, action, confidence, expected_return, source,
         |  signal_timestamp
         |FROM signals
         |WHERE ticker IN $tickerSetSql
         |ORDER BY COALESCE(signal_timestamp, created_at) DESC, id DESC
         |LIMIT 20""".stripMargin,
    "q108_recent_trades" ->
      s"""${TradeQueries.tradesSql}
         |SELECT ticker,
         |  CASE WHEN is_close THEN 'SELL' ELSE 'BUY' END AS action,
         |  quantity AS shares, price,
         |  strftime(CAST(ts AS DATE), '%Y-%m-%d') AS trade_date,
         |  ts AS created_at
         |FROM trades
         |WHERE ticker IN $tickerSetSql
         |ORDER BY ts DESC, trade_id DESC LIMIT 25""".stripMargin,
    "q109_perf_by_run" ->
      s"""${TradeQueries.tradesSql},
         |per_run AS (
         |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS run_id,
         |    COUNT(*) AS num_trades,
         |    ${sqlSum("pnl")} AS total_pnl,
         |    CAST(SUM(CASE WHEN pnl > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |      / COUNT(*) AS win_rate
         |  FROM trades WHERE is_close GROUP BY 1)
         |SELECT run_id, num_trades, total_pnl, win_rate,
         |  CAST(SUM(CAST(total_pnl AS DECIMAL(38,6))) OVER (
         |    ORDER BY run_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    AS equity
         |FROM per_run""".stripMargin,
    // identical IEEE op order to the Spark kernel: the recursive CTE
    // steps one execution at a time per ticker, and every arithmetic
    // expression (weighted-avg entry, ratios) is written with the same
    // parenthesization — the hash compare is bit-exact
    "q113_positions_replay" ->
      """WITH RECURSIVE execs AS (
        |  SELECT 'U' || CAST(user_id AS VARCHAR) AS ticker, ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 'BUY' ELSE 'SELL' END AS action,
        |    CAST(event_id % 3 + 1 AS DOUBLE) AS qty,
        |    value AS price
        |  FROM events
        |  WHERE event_type IN ('purchase', 'click') AND value > 0),
        |numbered AS (
        |  SELECT *, row_number() OVER (PARTITION BY ticker ORDER BY ts, event_id) AS rn
        |  FROM execs),
        |walk(ticker, rn, shares, entry) AS (
        |  SELECT ticker, rn,
        |    CASE WHEN action = 'BUY' THEN qty ELSE -qty END,
        |    price
        |  FROM numbered WHERE rn = 1
        |  UNION ALL
        |  SELECT n.ticker, n.rn,
        |    w.shares + (CASE WHEN n.action = 'BUY' THEN n.qty ELSE -n.qty END),
        |    CASE
        |      WHEN w.shares = 0 THEN n.price
        |      WHEN (w.shares > 0) = ((CASE WHEN n.action = 'BUY' THEN n.qty ELSE -n.qty END) > 0)
        |        THEN (abs(w.shares) * w.entry
        |              + abs(CASE WHEN n.action = 'BUY' THEN n.qty ELSE -n.qty END) * n.price)
        |             / (abs(w.shares) + abs(CASE WHEN n.action = 'BUY' THEN n.qty ELSE -n.qty END))
        |      WHEN abs(CASE WHEN n.action = 'BUY' THEN n.qty ELSE -n.qty END) < abs(w.shares)
        |        THEN w.entry
        |      WHEN abs(CASE WHEN n.action = 'BUY' THEN n.qty ELSE -n.qty END) = abs(w.shares)
        |        THEN NULL
        |      ELSE n.price
        |    END
        |  FROM walk w JOIN numbered n ON n.ticker = w.ticker AND n.rn = w.rn + 1),
        |final AS (
        |  SELECT w.ticker, w.shares, w.entry
        |  FROM walk w
        |  JOIN (SELECT ticker, MAX(rn) AS mrn FROM numbered GROUP BY ticker) m
        |    ON m.ticker = w.ticker AND w.rn = m.mrn),
        |cur AS (
        |  SELECT ticker, price AS current_price FROM (
        |    SELECT ticker, price, row_number() OVER (
        |      PARTITION BY ticker ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM execs WHERE action = 'BUY')
        |  WHERE rn = 1)
        |SELECT f.ticker,
        |  CAST(round(f.shares) AS INT) AS shares,
        |  f.entry AS entry_price,
        |  c.current_price,
        |  c.current_price * f.shares AS market_value,
        |  CASE WHEN c.current_price IS NOT NULL AND f.entry IS NOT NULL
        |      AND f.entry != 0
        |    THEN (c.current_price / f.entry - 1.0)
        |         * (CASE WHEN f.shares > 0 THEN 1.0 ELSE -1.0 END) END
        |    AS unrealized_pnl_pct
        |FROM final f LEFT JOIN cur c ON c.ticker = f.ticker
        |WHERE abs(f.shares) >= 1e-6""".stripMargin,

    "q110_perf_latest" -> {
      val wins = "CAST(SUM(CAST(CASE WHEN pnl > 0 THEN pnl ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)"
      val losses = "CAST(SUM(CAST(CASE WHEN pnl < 0 THEN pnl ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)"
      s"""${TradeQueries.tradesSql},
         |closed AS (
         |  SELECT *, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS run_id
         |  FROM trades WHERE is_close)
         |SELECT run_id, COUNT(*) AS num_trades,
         |  ${sqlSum("pnl")} AS total_return,
         |  CAST(SUM(CASE WHEN pnl > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS win_rate,
         |  CASE WHEN abs($losses) > 0 THEN $wins / abs($losses) END AS profit_factor,
         |  CASE WHEN SUM(CASE WHEN pnl > 0 THEN 1 ELSE 0 END) > 0
         |    THEN $wins / SUM(CASE WHEN pnl > 0 THEN 1 ELSE 0 END) END AS avg_win,
         |  CASE WHEN SUM(CASE WHEN pnl < 0 THEN 1 ELSE 0 END) > 0
         |    THEN $losses / SUM(CASE WHEN pnl < 0 THEN 1 ELSE 0 END) END AS avg_loss,
         |  MAX(pnl) AS largest_win,
         |  MIN(pnl) AS largest_loss
         |FROM closed
         |WHERE run_id = (SELECT MAX(run_id) FROM closed)
         |GROUP BY run_id""".stripMargin
    },

    "q115_trade_events_classified" ->
      s"""${TradeQueries.tradesSql},
         |classified AS (
         |  SELECT ticker,
         |    CASE WHEN is_close THEN 'SELL' ELSE 'BUY' END AS action,
         |    price, pnl, ts, trade_id,
         |    CASE WHEN NOT is_close THEN 'entry'
         |         WHEN pnl > 0 THEN 'exit_win'
         |         WHEN pnl < 0 THEN 'exit_loss'
         |         ELSE 'exit' END AS event_class
         |  FROM trades WHERE ticker IN $tickerSetSql)
         |SELECT ticker, action, event_class, price, pnl
         |FROM classified ORDER BY ts DESC, trade_id DESC LIMIT 40""".stripMargin,

    "q116_model_params_latest" ->
      s"""WITH $forecastsSql
         |SELECT ticker, model_type, params, created_at
         |FROM forecasts WHERE params IS NOT NULL
         |ORDER BY created_at DESC, id DESC LIMIT 400""".stripMargin,

    "q117_forecast_history" ->
      s"""WITH $forecastsSql,
         |ranked AS (
         |  SELECT ticker, id, model_type, created_at, row_number() OVER (
         |    PARTITION BY ticker ORDER BY created_at DESC, id DESC) AS rn
         |  FROM forecasts WHERE ticker IN $tickerSetSql)
         |SELECT ticker, id, model_type, created_at
         |FROM ranked WHERE rn <= 10""".stripMargin,

    "q118_equity_by_ticker" ->
      s"""${TradeQueries.tradesSql}
         |SELECT ticker, ts, trade_id, pnl,
         |  CAST(SUM(CAST(pnl AS DECIMAL(38,6))) OVER (
         |    PARTITION BY ticker ORDER BY ts, trade_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    AS equity
         |FROM trades WHERE is_close AND ticker IN $tickerSetSql""".stripMargin,

    "q119_data_checks" ->
      s"""${TradeQueries.tradesSql}
         |SELECT COUNT(*) AS n_trade_rows,
         |  CAST(SUM(CASE WHEN NOT is_close THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_buys,
         |  CAST(SUM(CASE WHEN is_close THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_sells,
         |  SUM(CASE WHEN NOT is_close THEN 1 ELSE 0 END) > 0
         |    AND SUM(CASE WHEN is_close THEN 1 ELSE 0 END) = 0
         |    AS only_buys,
         |  COUNT(DISTINCT CASE WHEN is_close
         |    THEN strftime(CAST(ts AS DATE), '%Y-%m-%d') END) AS n_perf_rows
         |FROM trades""".stripMargin,

    "q120_positions_min" ->
      s"""WITH $closesSql,
         |pos AS (
         |  SELECT ticker, date_trunc('day', ts) AS position_date,
         |    CAST(COUNT(*) AS DOUBLE) AS shares,
         |    ${sqlAvg("close")} AS average_cost
         |  FROM closes GROUP BY 1, 2)
         |SELECT ticker, shares, average_cost
         |FROM pos
         |WHERE position_date = (SELECT MAX(position_date) FROM pos)""".stripMargin,

    "q121_ohlcv_provenance" ->
      s"""WITH $closesSql
         |SELECT CASE WHEN CAST(substr(ticker, 2) AS BIGINT) % 3 = 0
         |    THEN 'synthetic' ELSE 'live' END AS source,
         |  COUNT(*) AS n
         |FROM closes GROUP BY 1""".stripMargin,

    "q122_db_metadata" ->
      """WITH meta AS (
        |  SELECT strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_ts_val,
        |    CAST(COUNT(*) AS VARCHAR) AS n_val
        |  FROM events),
        |kv AS (
        |  SELECT 'last_ts' AS key, last_ts_val AS value FROM meta
        |  UNION ALL SELECT 'n_events', n_val FROM meta
        |  UNION ALL SELECT 'schema_version', 'v1' FROM meta)
        |SELECT key, value FROM kv WHERE key = 'last_ts' LIMIT 1""".stripMargin,

    "q123_barbell_buckets" ->
      s"""${TradeQueries.tradesSql}
         |SELECT CASE WHEN user_id % 10 < 3 THEN 'aggressive_growth'
         |    WHEN user_id % 10 < 6 THEN 'core'
         |    ELSE 'defensive_value' END AS bucket,
         |  COUNT(DISTINCT ticker) AS n_tickers,
         |  COUNT(*) AS n_trades
         |FROM trades GROUP BY 1""".stripMargin,

    "q124_default_tickers" ->
      s"""${TradeQueries.tradesSql},
         |$signalsSql,
         |u AS (
         |  SELECT DISTINCT ticker, 0 AS pri FROM signals
         |  UNION ALL SELECT DISTINCT ticker, 1 AS pri FROM trades)
         |SELECT ticker FROM u WHERE pri = (SELECT MIN(pri) FROM u)
         |ORDER BY ticker LIMIT 200""".stripMargin,

    "q140_provenance_origin" ->
      s"""${TradeQueries.tradesSql},
         |$closesSql,
         |oc AS (
         |  SELECT CAST(SUM(CASE WHEN CAST(substr(ticker, 2) AS BIGINT) % 3 = 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ohlcv_synthetic,
         |    CAST(SUM(CASE WHEN CAST(substr(ticker, 2) AS BIGINT) % 3 <> 0
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ohlcv_live
         |  FROM closes),
         |tc AS (
         |  SELECT CAST(SUM(CASE WHEN is_synthetic THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_trade_synthetic,
         |    CAST(SUM(CASE WHEN NOT is_synthetic THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_trade_live
         |  FROM trades),
         |ds AS (
         |  SELECT CAST(COUNT(DISTINCT CASE WHEN user_id % 30 <> 0
         |    AND user_id % 3 = 0 THEN 'ds-' || CAST(user_id % 5 AS VARCHAR)
         |    END) AS BIGINT) AS n_dataset_ids
         |  FROM trades)
         |SELECT CASE
         |    WHEN (n_ohlcv_synthetic > 0 OR n_trade_synthetic > 0
         |        OR n_dataset_ids > 0)
         |      AND (n_ohlcv_live > 0 OR n_trade_live > 0) THEN 'mixed'
         |    WHEN n_ohlcv_synthetic > 0 OR n_trade_synthetic > 0
         |      OR n_dataset_ids > 0 THEN 'synthetic'
         |    ELSE 'live' END AS origin,
         |  n_ohlcv_synthetic, n_ohlcv_live, n_trade_synthetic, n_trade_live,
         |  n_dataset_ids
         |FROM oc, tc, ds""".stripMargin,

    "q141_trade_events_latest_run" ->
      s"""${TradeQueries.tradesSql},
         |runs AS (
         |  SELECT t.*, CASE WHEN user_id % 7 = 0 THEN NULL
         |    ELSE strftime(CAST(ts AS DATE), '%Y-%m-%d') END AS run_id
         |  FROM trades t),
         |latest AS (
         |  SELECT run_id FROM runs WHERE run_id IS NOT NULL
         |  ORDER BY ts DESC, trade_id DESC LIMIT 1),
         |ev AS (
         |  SELECT ticker, ts, trade_id, price, pnl, run_id,
         |    CASE WHEN is_close THEN 'SELL' ELSE 'BUY' END AS action,
         |    CASE WHEN NOT is_close THEN 'entry'
         |      WHEN pnl > 0 THEN 'exit_win'
         |      WHEN pnl < 0 THEN 'exit_loss'
         |      ELSE 'exit' END AS event_class
         |  FROM runs JOIN latest USING (run_id)
         |  WHERE ticker IN $tickerSetSql)
         |SELECT ticker, action, event_class, price, pnl, run_id
         |FROM ev ORDER BY ts DESC, trade_id DESC LIMIT 40""".stripMargin,

    "q142_pnl_canonical" -> {
      val wins = "CAST(SUM(CAST(CASE WHEN pnl > 0 THEN pnl ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)"
      val losses = "CAST(SUM(CAST(CASE WHEN pnl < 0 THEN pnl ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE)"
      s"""${TradeQueries.tradesSql},
         |prod AS (
         |  SELECT t.* FROM trades t
         |  WHERE t.is_close AND t.pnl IS NOT NULL AND NOT EXISTS (
         |    SELECT 1 FROM trades o
         |    WHERE o.trade_id = t.entry_trade_id AND NOT o.is_close
         |      AND o.is_synthetic)),
         |excl AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS synthetic_excluded
         |  FROM trades t
         |  WHERE t.is_close AND t.pnl IS NOT NULL AND EXISTS (
         |    SELECT 1 FROM trades o
         |    WHERE o.trade_id = t.entry_trade_id AND NOT o.is_close
         |      AND o.is_synthetic)),
         |op AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS opening_legs_with_pnl
         |  FROM trades WHERE NOT is_close AND pnl IS NOT NULL),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS trade_count,
         |    ${sqlSum("pnl")} AS total_realized_pnl,
         |    CAST(SUM(CASE WHEN pnl > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         |      / COUNT(*) AS win_rate,
         |    CASE WHEN abs($losses) > 0
         |      THEN $wins / abs($losses) END AS profit_factor,
         |    CASE WHEN SUM(CASE WHEN pnl > 0 THEN 1 ELSE 0 END) > 0
         |      THEN $wins / SUM(CASE WHEN pnl > 0 THEN 1 ELSE 0 END)
         |      END AS avg_win,
         |    CASE WHEN SUM(CASE WHEN pnl < 0 THEN 1 ELSE 0 END) > 0
         |      THEN $losses / SUM(CASE WHEN pnl < 0 THEN 1 ELSE 0 END)
         |      END AS avg_loss,
         |    COALESCE(MAX(CASE WHEN pnl > 0 THEN pnl END), 0.0) AS largest_win,
         |    COALESCE(MIN(CASE WHEN pnl < 0 THEN pnl END), 0.0) AS largest_loss
         |  FROM prod)
         |SELECT m.*, excl.synthetic_excluded, op.opening_legs_with_pnl
         |FROM m, excl, op""".stripMargin
    }
  )
}
