package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.exec.PortfolioEngine

/** The FIFO paper-trading engine under the oracle gate (reference
  * execution/paper_trading_engine.py:201-2030; FIFO allocator :344-455;
  * exits/ratchet :1603-1767; sizing :1040-1165).
  *
  * q162 runs the REAL [[PortfolioEngine.backtest]] over a deterministic
  * per-(ticker, day) signal tape and the oracle replays the ENTIRE state
  * machine in a DuckDB recursive CTE whose rows carry the engine state —
  * cash, next trade id, the long/short lot BOOKS as lists of structs,
  * the position lifecycle (entry/stop/target/entry-bar), and the
  * accumulated fills. Every IEEE operation is mirrored in Scala's order:
  * ratchet → stop → target → time exits, then the signal action; the
  * provenance-then-FIFO close order is DuckDB's struct list_sort on
  * (syn, tid); the take/remaining recursion and the sequential cash
  * folds are closed-form because the action tape bounds books at three
  * lots (BUYs at di%7∈{6,1,2} before the di%7=3 close) and the engine
  * always closes positions in full.
  */
object EngineQueries extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    "q162_paper_engine" -> ((s, dir) => {
      import s.implicits._
      val ev = Bars.of(s, dir)
        .groupBy($"ticker", $"day")
        .agg(Det.davg($"price").as("p"),
          (max($"price") - min($"price")).as("atr0"))
        .withColumn("di", row_number()
          .over(Window.partitionBy($"ticker").orderBy($"day")).cast("int"))
        .select($"ticker", $"day".as("ts"), $"p".as("price"),
          when($"di" % 7 === 1 || $"di" % 7 === 2 || $"di" % 7 === 6, "BUY")
            .when($"di" % 7 === 3 || $"di" % 7 === 4, "SELL")
            .otherwise("HOLD").as("action"),
          (lit(0.3) + lit(0.1) * ($"di" % 5)).as("confidence"),
          ($"di" % 2 === 0).as("isSynthetic"),
          $"atr0".as("atr"), lit(1.0).as("regimeRiskMult"),
          $"di".cast("long").as("seq"))
      PortfolioEngine.backtest(ev,
          PortfolioEngine.Config(maxHoldBars = 3))
        .toDF()
        .select($"ticker", $"ts", $"tradeId".as("trade_id"), $"action",
          $"quantity", $"price", $"isClose".as("is_close"),
          $"entryTradeId".as("entry_tid"), $"pnl",
          $"exitReason".as("reason"), $"isSynthetic".as("syn"), $"side")
    }),

    // Strategy optimizer / candidate simulator (reference
    // etl/strategy_optimizer.py:43-250, backtesting/candidate_simulator
    // .py): the REAL StrategyOptimizer.sweep replays the same signal
    // tape through the engine under a 2×2×2 (stop, target, kelly) grid
    // and scores each candidate by final equity minus a drawdown
    // penalty. The oracle re-runs the parameterized state machine per
    // (candidate, ticker) — no ratchet stage: sweep events carry no
    // ATR — then rebuilds the per-candidate equity curve with the
    // sweep's deterministic (tsMillis, ticker, tradeId) order as an
    // ordered recursion (DuckDB's windowed SUM is tree-shaped, not the
    // sequential fold Spark's running frame uses).
    "q164_strategy_sweep" -> ((s, dir) => {
      import s.implicits._
      val ev = Bars.of(s, dir)
        .groupBy($"ticker", $"day")
        .agg(Det.davg($"price").as("p"))
        .withColumn("di", row_number()
          .over(Window.partitionBy($"ticker").orderBy($"day")).cast("int"))
        .select($"ticker", $"day".as("ts"), $"p".as("price"),
          when($"di" % 7 === 1 || $"di" % 7 === 2 || $"di" % 7 === 6, "BUY")
            .when($"di" % 7 === 3 || $"di" % 7 === 4, "SELL")
            .otherwise("HOLD").as("action"),
          (lit(0.3) + lit(0.1) * ($"di" % 5)).as("confidence"),
          ($"di" % 2 === 0).as("isSynthetic"))
      val cands = graft.exec.StrategyOptimizer.grid(
        stops = Seq(0.03, 0.08), targets = Seq(0.06, 0.15),
        kellys = Seq(0.1, 0.3))
      graft.exec.StrategyOptimizer.sweep(ev, cands, topK = 8)
        .toDF()
        .select($"candId".as("cand_id"), $"stopLossPct".as("stop_loss_pct"),
          $"takeProfitPct".as("take_profit_pct"), $"kellyCap".as("kelly_cap"),
          $"totalPnl".as("total_pnl"), $"nTrades".as("n_trades"),
          $"maxDrawdown".as("max_drawdown"), $"score")
    })
  )

  // macro expansion helpers (pure textual): __R0(b) = append-order
  // qty fold; __LS/__SS = basis folds; __EF = empty fills list
  private val r0 = (b: String) =>
    s"((COALESCE($b[1].qty, CAST(0.0 AS DOUBLE)) + COALESCE($b[2].qty, CAST(0.0 AS DOUBLE))) + COALESCE($b[3].qty, CAST(0.0 AS DOUBLE)))"
  private val basis = (b: String) =>
    s"((COALESCE($b[1].qty * $b[1].px, CAST(0.0 AS DOUBLE)) + COALESCE($b[2].qty * $b[2].px, CAST(0.0 AS DOUBLE))) + COALESCE($b[3].qty * $b[3].px, CAST(0.0 AS DOUBLE)))"
  private val emptyFills =
    "CAST([] AS STRUCT(ts TIMESTAMP, tid BIGINT, act VARCHAR, qty DOUBLE, px DOUBLE, ic BOOLEAN, etid BIGINT, pnl DOUBLE, rsn VARCHAR, syn BOOLEAN, side VARCHAR)[])"
  private val emptyLots =
    "CAST([] AS STRUCT(syn BOOLEAN, tid BIGINT, qty DOUBLE, px DOUBLE)[])"
  // takes over the SORTED book; remaining over the APPEND-order fold
  private def take(b: String, i: Int): String = i match {
    case 1 => s"LEAST(list_sort($b)[1].qty, ${r0(b)})"
    case 2 => s"LEAST(list_sort($b)[2].qty, ${r0(b)} - ${take(b, 1)})"
    case _ => s"LEAST(list_sort($b)[3].qty, (${r0(b)} - ${take(b, 1)}) - ${take(b, 2)})"
  }
  private def rem(b: String, i: Int): String = i match {
    case 1 => r0(b)
    case 2 => s"(${r0(b)} - ${take(b, 1)})"
    case _ => s"((${r0(b)} - ${take(b, 1)}) - ${take(b, 2)})"
  }
  // fills emitted by a full close of book b at price p (event ts/syn)
  private def fills(b: String, short: Boolean, reason: String, nid: String): String = {
    val act = if (short) "'BUY'" else "'SELL'"
    val side = if (short) "'SHORT'" else "'LONG'"
    (1 to 3).map { i =>
      val pnl =
        if (short) s"(list_sort($b)[$i].px - e_p) * ${take(b, i)}"
        else s"(e_p - list_sort($b)[$i].px) * ${take(b, i)}"
      s"""(CASE WHEN len($b) >= $i AND ${rem(b, i)} > CAST(1e-12 AS DOUBLE) THEN
         |  [{'ts': e_ts, 'tid': $nid + ${i - 1}, 'act': $act,
         |    'qty': ${take(b, i)}, 'px': e_p, 'ic': true,
         |    'etid': list_sort($b)[$i].tid, 'pnl': $pnl,
         |    'rsn': $reason, 'syn': e_syn, 'side': $side}]
         |  ELSE $emptyFills END)""".stripMargin
    }.mkString(" || ")
  }
  // cash delta of a full close (sequential fold over emitted takes)
  private def closeCash(b: String, short: Boolean, cash: String): String = {
    val sign = if (short) "-" else "+"
    (1 to 3).foldLeft(cash) { (acc, i) =>
      s"($acc $sign (CASE WHEN len($b) >= $i AND ${rem(b, i)} > CAST(1e-12 AS DOUBLE) THEN ${take(b, i)} * e_p ELSE CAST(0.0 AS DOUBLE) END))"
    }
  }
  private def nFills(b: String): String =
    s"(CASE WHEN len($b) >= 1 AND ${rem(b, 1)} > CAST(1e-12 AS DOUBLE) THEN 1 ELSE 0 END + CASE WHEN len($b) >= 2 AND ${rem(b, 2)} > CAST(1e-12 AS DOUBLE) THEN 1 ELSE 0 END + CASE WHEN len($b) >= 3 AND ${rem(b, 3)} > CAST(1e-12 AS DOUBLE) THEN 1 ELSE 0 END)"


  override def oracles: Map[String, String] = Map(
    "q162_paper_engine" -> {
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |d1 AS MATERIALIZED (
         |  SELECT ticker, day, ${Det.sqlAvg("price")} AS lp,
         |         MAX(price) - MIN(price) AS atr0
         |  FROM bars GROUP BY ticker, day),
         |ev AS MATERIALIZED (
         |  SELECT ticker, day AS ts, lp AS p,
         |    CASE WHEN di % 7 IN (1, 2, 6) THEN 'BUY'
         |         WHEN di % 7 IN (3, 4) THEN 'SELL' ELSE 'HOLD' END AS act,
         |    CAST(0.3 AS DOUBLE) + CAST(0.1 AS DOUBLE) * (di % 5) AS conf,
         |    di % 2 = 0 AS syn, atr0 AS atr, di AS rn
         |  FROM (SELECT *, CAST(row_number() OVER (PARTITION BY ticker ORDER BY day) AS INT) AS di FROM d1)),
         |cnt AS (SELECT ticker, MAX(rn) AS mx FROM ev GROUP BY 1),
         |rec AS (
         |  SELECT ticker, 0 AS rn,
         |    CAST(10000.0 AS DOUBLE) AS cash, CAST(1 AS BIGINT) AS nid,
         |    $emptyLots AS lots, $emptyLots AS slots,
         |    CAST(0.0 AS DOUBLE) AS entry_px, CAST(0.0 AS DOUBLE) AS entry_atr,
         |    CAST(NULL AS DOUBLE) AS stop_lv, CAST(NULL AS DOUBLE) AS target_lv,
         |    -1 AS entry_bar,
         |    $emptyFills AS fills
         |  FROM (SELECT DISTINCT ticker FROM ev)
         |  UNION ALL
         |  SELECT ticker, e_rn,
         |    -- action stage over the post-exit state
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) > 0 THEN ${closeCash("slots_x", short = true, "cash_x")}
         |      WHEN e_act = 'BUY' AND open_qty > CAST(1e-9 AS DOUBLE) THEN cash_x - open_qty * e_p
         |      WHEN e_act = 'SELL' AND len(lots_x) > 0 THEN ${closeCash("lots_x", short = false, "cash_x")}
         |      WHEN e_act = 'SELL' AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN cash_x + sopen_qty * e_p
         |      ELSE cash_x END AS cash,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) > 0 THEN nid_x + ${nFills("slots_x")}
         |      WHEN e_act = 'BUY' AND open_qty > CAST(1e-9 AS DOUBLE) THEN nid_x + 1
         |      WHEN e_act = 'SELL' AND len(lots_x) > 0 THEN nid_x + ${nFills("lots_x")}
         |      WHEN e_act = 'SELL' AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN nid_x + 1
         |      ELSE nid_x END AS nid,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) = 0 AND open_qty > CAST(1e-9 AS DOUBLE)
         |        THEN list_append(lots_x, {'syn': e_syn, 'tid': nid_x, 'qty': open_qty, 'px': e_p})
         |      WHEN e_act = 'SELL' AND len(lots_x) > 0 THEN $emptyLots
         |      ELSE lots_x END AS lots,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) > 0 THEN $emptyLots
         |      WHEN e_act = 'SELL' AND len(lots_x) = 0 AND sopen_qty > CAST(1e-9 AS DOUBLE)
         |        THEN list_append(slots_x, {'syn': e_syn, 'tid': nid_x, 'qty': sopen_qty, 'px': e_p})
         |      ELSE slots_x END AS slots,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) = 0 AND len(lots_x) = 0
         |           AND open_qty > CAST(1e-9 AS DOUBLE) THEN e_p
         |      WHEN e_act = 'SELL' AND len(lots_x) = 0 AND len(slots_x) = 0
         |           AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN e_p
         |      WHEN (e_act = 'BUY' AND len(slots_x) > 0) OR
         |           (e_act = 'SELL' AND len(lots_x) > 0) THEN CAST(0.0 AS DOUBLE)
         |      ELSE entry_px_x END AS entry_px,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) = 0 AND len(lots_x) = 0
         |           AND open_qty > CAST(1e-9 AS DOUBLE) THEN GREATEST(CAST(0.0 AS DOUBLE), e_atr)
         |      WHEN e_act = 'SELL' AND len(lots_x) = 0 AND len(slots_x) = 0
         |           AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN GREATEST(CAST(0.0 AS DOUBLE), e_atr)
         |      WHEN (e_act = 'BUY' AND len(slots_x) > 0) OR
         |           (e_act = 'SELL' AND len(lots_x) > 0) THEN CAST(0.0 AS DOUBLE)
         |      ELSE entry_atr_x END AS entry_atr,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) = 0 AND len(lots_x) = 0
         |           AND open_qty > CAST(1e-9 AS DOUBLE) THEN e_p * (1 - CAST(0.05 AS DOUBLE))
         |      WHEN e_act = 'SELL' AND len(lots_x) = 0 AND len(slots_x) = 0
         |           AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN e_p * (1 + CAST(0.05 AS DOUBLE))
         |      WHEN (e_act = 'BUY' AND len(slots_x) > 0) OR
         |           (e_act = 'SELL' AND len(lots_x) > 0) THEN CAST(NULL AS DOUBLE)
         |      ELSE stop_x END AS stop_lv,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) = 0 AND len(lots_x) = 0
         |           AND open_qty > CAST(1e-9 AS DOUBLE) THEN e_p * (1 + CAST(0.10 AS DOUBLE))
         |      WHEN e_act = 'SELL' AND len(lots_x) = 0 AND len(slots_x) = 0
         |           AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN e_p * (1 - CAST(0.10 AS DOUBLE))
         |      WHEN (e_act = 'BUY' AND len(slots_x) > 0) OR
         |           (e_act = 'SELL' AND len(lots_x) > 0) THEN CAST(NULL AS DOUBLE)
         |      ELSE target_x END AS target_lv,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) = 0 AND len(lots_x) = 0
         |           AND open_qty > CAST(1e-9 AS DOUBLE) THEN e_rn - 1
         |      WHEN e_act = 'SELL' AND len(lots_x) = 0 AND len(slots_x) = 0
         |           AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN e_rn - 1
         |      WHEN (e_act = 'BUY' AND len(slots_x) > 0) OR
         |           (e_act = 'SELL' AND len(lots_x) > 0) THEN -1
         |      ELSE entry_bar_x END AS entry_bar,
         |    fills_x ||
         |      (CASE
         |        WHEN e_act = 'BUY' AND len(slots_x) > 0
         |          THEN ${fills("slots_x", short = true, "'SIGNAL'", "nid_x")}
         |        WHEN e_act = 'BUY' AND open_qty > CAST(1e-9 AS DOUBLE) THEN
         |          [{'ts': e_ts, 'tid': nid_x, 'act': 'BUY', 'qty': open_qty,
         |            'px': e_p, 'ic': false, 'etid': CAST(-1 AS BIGINT),
         |            'pnl': CAST(0.0 AS DOUBLE), 'rsn': '', 'syn': e_syn,
         |            'side': 'LONG'}]
         |        WHEN e_act = 'SELL' AND len(lots_x) > 0
         |          THEN ${fills("lots_x", short = false, "'SIGNAL'", "nid_x")}
         |        WHEN e_act = 'SELL' AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN
         |          [{'ts': e_ts, 'tid': nid_x, 'act': 'SELL', 'qty': sopen_qty,
         |            'px': e_p, 'ic': false, 'etid': CAST(-1 AS BIGINT),
         |            'pnl': CAST(0.0 AS DOUBLE), 'rsn': '', 'syn': e_syn,
         |            'side': 'SHORT'}]
         |        ELSE $emptyFills END) AS fills
         |  FROM (
         |    -- exit stage: apply the close when reason fired; compute
         |    -- open sizings from the POST-exit books
         |    SELECT *,
         |      CASE WHEN e_p > 0 AND open_px0 > 0
         |        THEN LEAST(LEAST(cash_x, ((cash_x + ${basis("lots_x")}) - ${basis("slots_x")})
         |               * LEAST(CAST(0.2 AS DOUBLE), CAST(0.2 AS DOUBLE) * GREATEST(e_conf, CAST(0.0 AS DOUBLE)))
         |               * GREATEST(CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) / e_p,
         |             cash_x / open_px0)
         |        ELSE CAST(0.0 AS DOUBLE) END AS open_qty,
         |      CASE WHEN e_p > 0
         |        THEN ((cash_x + ${basis("lots_x")}) - ${basis("slots_x")})
         |               * LEAST(CAST(0.1 AS DOUBLE), CAST(0.1 AS DOUBLE) * GREATEST(e_conf, CAST(0.0 AS DOUBLE)))
         |               * GREATEST(CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) / e_p
         |        ELSE CAST(0.0 AS DOUBLE) END AS sopen_qty
         |    FROM (
         |      SELECT *,
         |        CASE WHEN rsn <> '' AND NOT is_short THEN $emptyLots ELSE r_lots END AS lots_x,
         |        CASE WHEN rsn <> '' AND is_short THEN $emptyLots ELSE r_slots END AS slots_x,
         |        CASE WHEN rsn <> '' AND is_short THEN ${closeCash("r_slots", short = true, "r_cash")}
         |             WHEN rsn <> '' THEN ${closeCash("r_lots", short = false, "r_cash")}
         |             ELSE r_cash END AS cash_x,
         |        CASE WHEN rsn <> '' AND is_short THEN r_nid + ${nFills("r_slots")}
         |             WHEN rsn <> '' THEN r_nid + ${nFills("r_lots")}
         |             ELSE r_nid END AS nid_x,
         |        CASE WHEN rsn <> '' THEN CAST(0.0 AS DOUBLE) ELSE r_entry_px END AS entry_px_x,
         |        CASE WHEN rsn <> '' THEN CAST(0.0 AS DOUBLE) ELSE r_entry_atr END AS entry_atr_x,
         |        CASE WHEN rsn <> '' THEN CAST(NULL AS DOUBLE) ELSE stop1 END AS stop_x,
         |        CASE WHEN rsn <> '' THEN CAST(NULL AS DOUBLE) ELSE r_target END AS target_x,
         |        CASE WHEN rsn <> '' THEN -1 ELSE r_entry_bar END AS entry_bar_x,
         |        CASE WHEN rsn <> '' AND is_short THEN r_fills || ${fills("r_slots", short = true, "rsn", "r_nid")}
         |             WHEN rsn <> '' THEN r_fills || ${fills("r_lots", short = false, "rsn", "r_nid")}
         |             ELSE r_fills END AS fills_x,
         |        CASE WHEN e_p > 0 THEN e_p ELSE CAST(0.0 AS DOUBLE) END AS open_px0
         |      FROM (
         |        -- ratchet + exit-reason stage
         |        SELECT *,
         |          CASE WHEN len(CASE WHEN is_short THEN r_slots ELSE r_lots END) = 0 THEN ''
         |            WHEN NOT is_short AND e_p <= stop1 THEN 'STOP_LOSS'
         |            WHEN is_short AND e_p >= stop1 THEN 'STOP_LOSS'
         |            WHEN NOT is_short AND e_p >= r_target THEN 'TAKE_PROFIT'
         |            WHEN is_short AND e_p <= r_target THEN 'TAKE_PROFIT'
         |            WHEN (CASE WHEN r_entry_bar >= 0 THEN (e_rn - 1) - r_entry_bar ELSE 0 END) >= 3 THEN 'TIME'
         |            ELSE '' END AS rsn
         |        FROM (
         |          SELECT r.ticker, e.rn AS e_rn, e.ts AS e_ts, e.p AS e_p,
         |            e.act AS e_act, e.conf AS e_conf, e.syn AS e_syn,
         |            e.atr AS e_atr,
         |            r.cash AS r_cash, r.nid AS r_nid, r.lots AS r_lots,
         |            r.slots AS r_slots, r.entry_px AS r_entry_px,
         |            r.entry_atr AS r_entry_atr, r.target_lv AS r_target,
         |            r.entry_bar AS r_entry_bar, r.fills AS r_fills,
         |            len(r.slots) > 0 AS is_short,
         |            CASE
         |              WHEN len(CASE WHEN len(r.slots) > 0 THEN r.slots ELSE r.lots END) > 0
         |                   AND r.entry_atr > 0 AND r.stop_lv IS NOT NULL THEN
         |                CASE WHEN len(r.slots) = 0 THEN
         |                  CASE
         |                    WHEN (e.p - r.entry_px) >= CAST(1.5 AS DOUBLE) * r.entry_atr
         |                         AND (r.entry_px + CAST(0.5 AS DOUBLE) * r.entry_atr) > r.stop_lv
         |                      THEN r.entry_px + CAST(0.5 AS DOUBLE) * r.entry_atr
         |                    WHEN (e.p - r.entry_px) >= CAST(1.5 AS DOUBLE) * r.entry_atr
         |                      THEN r.stop_lv
         |                    WHEN (e.p - r.entry_px) >= CAST(1.0 AS DOUBLE) * r.entry_atr
         |                         AND r.entry_px > r.stop_lv
         |                      THEN r.entry_px
         |                    ELSE r.stop_lv END
         |                ELSE
         |                  CASE
         |                    WHEN (r.entry_px - e.p) >= CAST(1.5 AS DOUBLE) * r.entry_atr
         |                         AND (r.entry_px - CAST(0.5 AS DOUBLE) * r.entry_atr) < r.stop_lv
         |                      THEN r.entry_px - CAST(0.5 AS DOUBLE) * r.entry_atr
         |                    WHEN (r.entry_px - e.p) >= CAST(1.5 AS DOUBLE) * r.entry_atr
         |                      THEN r.stop_lv
         |                    WHEN (r.entry_px - e.p) >= CAST(1.0 AS DOUBLE) * r.entry_atr
         |                         AND r.entry_px < r.stop_lv
         |                      THEN r.entry_px
         |                    ELSE r.stop_lv END
         |                END
         |              ELSE r.stop_lv END AS stop1
         |          FROM rec r JOIN ev e ON e.ticker = r.ticker AND e.rn = r.rn + 1
         |        ) q1
         |      ) q2
         |    ) q3
         |  ) q4
         |),
         |last AS (
         |  SELECT r.* FROM rec r JOIN cnt c ON r.ticker = c.ticker AND r.rn = c.mx),
         |flat AS (SELECT ticker, unnest(fills) AS f FROM last)
         |SELECT ticker, f.ts AS ts, f.tid AS trade_id, f.act AS action,
         |  f.qty AS quantity, f.px AS price, f.ic AS is_close,
         |  f.etid AS entry_tid, f.pnl AS pnl, f.rsn AS reason,
         |  f.syn AS syn, f.side AS side
         |FROM flat""".stripMargin
    },

    "q164_strategy_sweep" -> {
      val slimEmpty =
        "CAST([] AS STRUCT(tsm BIGINT, tid BIGINT, pnl DOUBLE, ic BOOLEAN)[])"
      // slim close fills for the sweep oracle (only the stats inputs)
      def sfills(b: String, short: Boolean, nid: String): String =
        (1 to 3).map { i =>
          val pnl =
            if (short) s"(list_sort($b)[$i].px - e_p) * ${take(b, i)}"
            else s"(e_p - list_sort($b)[$i].px) * ${take(b, i)}"
          s"""(CASE WHEN len($b) >= $i AND ${rem(b, i)} > CAST(1e-12 AS DOUBLE) THEN
             |  [{'tsm': e_tsm, 'tid': $nid + ${i - 1}, 'pnl': $pnl, 'ic': true}]
             |  ELSE $slimEmpty END)""".stripMargin
        }.mkString(" || ")

      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |d1 AS MATERIALIZED (
         |  SELECT ticker, day, ${Det.sqlAvg("price")} AS lp
         |  FROM bars GROUP BY ticker, day),
         |ev0 AS MATERIALIZED (
         |  SELECT ticker, day AS ts, lp AS p,
         |    CASE WHEN di % 7 IN (1, 2, 6) THEN 'BUY'
         |         WHEN di % 7 IN (3, 4) THEN 'SELL' ELSE 'HOLD' END AS act,
         |    CAST(0.3 AS DOUBLE) + CAST(0.1 AS DOUBLE) * (di % 5) AS conf,
         |    di % 2 = 0 AS syn, di AS rn
         |  FROM (SELECT *, CAST(row_number() OVER (PARTITION BY ticker ORDER BY day) AS INT) AS di FROM d1)),
         |cands AS (
         |  SELECT CAST(cid AS BIGINT) AS cid, CAST(c_stop AS DOUBLE) AS c_stop,
         |    CAST(c_target AS DOUBLE) AS c_target, CAST(c_kelly AS DOUBLE) AS c_kelly
         |  FROM (VALUES (0, 0.03, 0.06, 0.1), (1, 0.03, 0.06, 0.3),
         |    (256, 0.03, 0.15, 0.1), (257, 0.03, 0.15, 0.3),
         |    (65536, 0.08, 0.06, 0.1), (65537, 0.08, 0.06, 0.3),
         |    (65792, 0.08, 0.15, 0.1), (65793, 0.08, 0.15, 0.3))
         |    v(cid, c_stop, c_target, c_kelly)),
         |ev2 AS MATERIALIZED (
         |  SELECT e.*, c.cid, c.c_stop, c.c_target, c.c_kelly
         |  FROM ev0 e CROSS JOIN cands c),
         |cnt AS (SELECT ticker, MAX(rn) AS mx FROM ev0 GROUP BY 1),
         |rec AS (
         |  SELECT t.ticker, c.cid, 0 AS rn,
         |    CAST(10000.0 AS DOUBLE) AS cash, CAST(1 AS BIGINT) AS nid,
         |    $emptyLots AS lots, $emptyLots AS slots,
         |    CAST(NULL AS DOUBLE) AS stop_lv, CAST(NULL AS DOUBLE) AS target_lv,
         |    -1 AS entry_bar,
         |    $slimEmpty AS fills
         |  FROM (SELECT DISTINCT ticker FROM ev0) t CROSS JOIN cands c
         |  UNION ALL
         |  SELECT ticker, cid, e_rn,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) > 0 THEN ${closeCash("slots_x", short = true, "cash_x")}
         |      WHEN e_act = 'BUY' AND open_qty > CAST(1e-9 AS DOUBLE) THEN cash_x - open_qty * e_p
         |      WHEN e_act = 'SELL' AND len(lots_x) > 0 THEN ${closeCash("lots_x", short = false, "cash_x")}
         |      WHEN e_act = 'SELL' AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN cash_x + sopen_qty * e_p
         |      ELSE cash_x END AS cash,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) > 0 THEN nid_x + ${nFills("slots_x")}
         |      WHEN e_act = 'BUY' AND open_qty > CAST(1e-9 AS DOUBLE) THEN nid_x + 1
         |      WHEN e_act = 'SELL' AND len(lots_x) > 0 THEN nid_x + ${nFills("lots_x")}
         |      WHEN e_act = 'SELL' AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN nid_x + 1
         |      ELSE nid_x END AS nid,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) = 0 AND open_qty > CAST(1e-9 AS DOUBLE)
         |        THEN list_append(lots_x, {'syn': e_syn, 'tid': nid_x, 'qty': open_qty, 'px': e_p})
         |      WHEN e_act = 'SELL' AND len(lots_x) > 0 THEN $emptyLots
         |      ELSE lots_x END AS lots,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) > 0 THEN $emptyLots
         |      WHEN e_act = 'SELL' AND len(lots_x) = 0 AND sopen_qty > CAST(1e-9 AS DOUBLE)
         |        THEN list_append(slots_x, {'syn': e_syn, 'tid': nid_x, 'qty': sopen_qty, 'px': e_p})
         |      ELSE slots_x END AS slots,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) = 0 AND len(lots_x) = 0
         |           AND open_qty > CAST(1e-9 AS DOUBLE) THEN e_p * (1 - c_stop)
         |      WHEN e_act = 'SELL' AND len(lots_x) = 0 AND len(slots_x) = 0
         |           AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN e_p * (1 + c_stop)
         |      WHEN (e_act = 'BUY' AND len(slots_x) > 0) OR
         |           (e_act = 'SELL' AND len(lots_x) > 0) THEN CAST(NULL AS DOUBLE)
         |      ELSE stop_x END AS stop_lv,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) = 0 AND len(lots_x) = 0
         |           AND open_qty > CAST(1e-9 AS DOUBLE) THEN e_p * (1 + c_target)
         |      WHEN e_act = 'SELL' AND len(lots_x) = 0 AND len(slots_x) = 0
         |           AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN e_p * (1 - c_target)
         |      WHEN (e_act = 'BUY' AND len(slots_x) > 0) OR
         |           (e_act = 'SELL' AND len(lots_x) > 0) THEN CAST(NULL AS DOUBLE)
         |      ELSE target_x END AS target_lv,
         |    CASE
         |      WHEN e_act = 'BUY' AND len(slots_x) = 0 AND len(lots_x) = 0
         |           AND open_qty > CAST(1e-9 AS DOUBLE) THEN e_rn - 1
         |      WHEN e_act = 'SELL' AND len(lots_x) = 0 AND len(slots_x) = 0
         |           AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN e_rn - 1
         |      WHEN (e_act = 'BUY' AND len(slots_x) > 0) OR
         |           (e_act = 'SELL' AND len(lots_x) > 0) THEN -1
         |      ELSE entry_bar_x END AS entry_bar,
         |    fills_x ||
         |      (CASE
         |        WHEN e_act = 'BUY' AND len(slots_x) > 0
         |          THEN ${sfills("slots_x", short = true, "nid_x")}
         |        WHEN e_act = 'BUY' AND open_qty > CAST(1e-9 AS DOUBLE) THEN
         |          [{'tsm': e_tsm, 'tid': nid_x, 'pnl': CAST(0.0 AS DOUBLE), 'ic': false}]
         |        WHEN e_act = 'SELL' AND len(lots_x) > 0
         |          THEN ${sfills("lots_x", short = false, "nid_x")}
         |        WHEN e_act = 'SELL' AND sopen_qty > CAST(1e-9 AS DOUBLE) THEN
         |          [{'tsm': e_tsm, 'tid': nid_x, 'pnl': CAST(0.0 AS DOUBLE), 'ic': false}]
         |        ELSE $slimEmpty END) AS fills
         |  FROM (
         |    SELECT *,
         |      CASE WHEN e_p > 0 AND open_px0 > 0
         |        THEN LEAST(LEAST(cash_x, ((cash_x + ${basis("lots_x")}) - ${basis("slots_x")})
         |               * LEAST(c_kelly, c_kelly * GREATEST(e_conf, CAST(0.0 AS DOUBLE)))
         |               * GREATEST(CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) / e_p,
         |             cash_x / open_px0)
         |        ELSE CAST(0.0 AS DOUBLE) END AS open_qty,
         |      CASE WHEN e_p > 0
         |        THEN ((cash_x + ${basis("lots_x")}) - ${basis("slots_x")})
         |               * LEAST(CAST(0.1 AS DOUBLE), CAST(0.1 AS DOUBLE) * GREATEST(e_conf, CAST(0.0 AS DOUBLE)))
         |               * GREATEST(CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)) / e_p
         |        ELSE CAST(0.0 AS DOUBLE) END AS sopen_qty
         |    FROM (
         |      SELECT *,
         |        CASE WHEN rsn <> '' AND NOT is_short THEN $emptyLots ELSE r_lots END AS lots_x,
         |        CASE WHEN rsn <> '' AND is_short THEN $emptyLots ELSE r_slots END AS slots_x,
         |        CASE WHEN rsn <> '' AND is_short THEN ${closeCash("r_slots", short = true, "r_cash")}
         |             WHEN rsn <> '' THEN ${closeCash("r_lots", short = false, "r_cash")}
         |             ELSE r_cash END AS cash_x,
         |        CASE WHEN rsn <> '' AND is_short THEN r_nid + ${nFills("r_slots")}
         |             WHEN rsn <> '' THEN r_nid + ${nFills("r_lots")}
         |             ELSE r_nid END AS nid_x,
         |        CASE WHEN rsn <> '' THEN CAST(NULL AS DOUBLE) ELSE r_stop END AS stop_x,
         |        CASE WHEN rsn <> '' THEN CAST(NULL AS DOUBLE) ELSE r_target END AS target_x,
         |        CASE WHEN rsn <> '' THEN -1 ELSE r_entry_bar END AS entry_bar_x,
         |        CASE WHEN rsn <> '' AND is_short THEN r_fills || ${sfills("r_slots", short = true, "r_nid")}
         |             WHEN rsn <> '' THEN r_fills || ${sfills("r_lots", short = false, "r_nid")}
         |             ELSE r_fills END AS fills_x,
         |        CASE WHEN e_p > 0 THEN e_p ELSE CAST(0.0 AS DOUBLE) END AS open_px0
         |      FROM (
         |        SELECT *,
         |          CASE WHEN len(CASE WHEN is_short THEN r_slots ELSE r_lots END) = 0 THEN ''
         |            WHEN NOT is_short AND e_p <= r_stop THEN 'STOP_LOSS'
         |            WHEN is_short AND e_p >= r_stop THEN 'STOP_LOSS'
         |            WHEN NOT is_short AND e_p >= r_target THEN 'TAKE_PROFIT'
         |            WHEN is_short AND e_p <= r_target THEN 'TAKE_PROFIT'
         |            WHEN (CASE WHEN r_entry_bar >= 0 THEN (e_rn - 1) - r_entry_bar ELSE 0 END) >= 20 THEN 'TIME'
         |            ELSE '' END AS rsn
         |        FROM (
         |          SELECT r.ticker, r.cid, e.rn AS e_rn, epoch_ms(e.ts) AS e_tsm,
         |            e.p AS e_p, e.act AS e_act, e.conf AS e_conf, e.syn AS e_syn,
         |            e.c_stop, e.c_target, e.c_kelly,
         |            r.cash AS r_cash, r.nid AS r_nid, r.lots AS r_lots,
         |            r.slots AS r_slots, r.stop_lv AS r_stop,
         |            r.target_lv AS r_target, r.entry_bar AS r_entry_bar,
         |            r.fills AS r_fills,
         |            len(r.slots) > 0 AS is_short
         |          FROM rec r JOIN ev2 e
         |            ON e.ticker = r.ticker AND e.cid = r.cid AND e.rn = r.rn + 1
         |        ) q1
         |      ) q2
         |    ) q3
         |  ) q4
         |),
         |last AS (
         |  SELECT r.* FROM rec r JOIN cnt c ON r.ticker = c.ticker AND r.rn = c.mx),
         |flat AS (SELECT ticker, cid, unnest(fills) AS f FROM last),
         |ranked AS MATERIALIZED (
         |  SELECT cid, ticker, f.tsm AS tsm, f.tid AS tid, f.pnl AS pnl,
         |    f.ic AS ic,
         |    row_number() OVER (PARTITION BY cid ORDER BY f.tsm, ticker, f.tid) AS rnk
         |  FROM flat),
         |curve AS (
         |  SELECT cid, rnk,
         |    CAST(0.0 AS DOUBLE) + (CASE WHEN ic THEN pnl ELSE CAST(0.0 AS DOUBLE) END) AS cum
         |  FROM ranked WHERE rnk = 1
         |  UNION ALL
         |  SELECT r.cid, r.rnk,
         |    c.cum + (CASE WHEN r.ic THEN r.pnl ELSE CAST(0.0 AS DOUBLE) END)
         |  FROM ranked r JOIN curve c ON r.cid = c.cid AND r.rnk = c.rnk + 1),
         |dd AS MATERIALIZED (
         |  SELECT cid, rnk, cum,
         |    MAX(cum) OVER (PARTITION BY cid ORDER BY rnk
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
         |  FROM curve),
         |stats AS (
         |  SELECT d.cid,
         |    MAX(CASE WHEN d.rnk = m.mxr THEN d.cum END) AS total_pnl,
         |    MAX(d.peak - d.cum) AS max_drawdown
         |  FROM dd d JOIN (SELECT cid, MAX(rnk) AS mxr FROM ranked GROUP BY 1) m
         |    ON d.cid = m.cid
         |  GROUP BY d.cid),
         |nt AS (SELECT cid, CAST(SUM(CASE WHEN ic THEN 1 ELSE 0 END) AS BIGINT) AS n_trades
         |  FROM ranked GROUP BY 1)
         |SELECT c.cid AS cand_id, c.c_stop AS stop_loss_pct,
         |  c.c_target AS take_profit_pct, c.c_kelly AS kelly_cap,
         |  s.total_pnl, nt.n_trades, s.max_drawdown,
         |  s.total_pnl - CAST(0.5 AS DOUBLE) *
         |    COALESCE(s.max_drawdown, CAST(0.0 AS DOUBLE)) AS score
         |FROM cands c JOIN stats s ON s.cid = c.cid
         |JOIN nt ON nt.cid = c.cid""".stripMargin
    }
  )
}
