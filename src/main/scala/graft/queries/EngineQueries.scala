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
    })
  )

  override def oracles: Map[String, String] = Map(
    "q162_paper_engine" -> {
      // macro expansion helpers (pure textual): __R0(b) = append-order
      // qty fold; __LS/__SS = basis folds; __EF = empty fills list
      val r0 = (b: String) =>
        s"((COALESCE($b[1].qty, CAST(0.0 AS DOUBLE)) + COALESCE($b[2].qty, CAST(0.0 AS DOUBLE))) + COALESCE($b[3].qty, CAST(0.0 AS DOUBLE)))"
      val basis = (b: String) =>
        s"((COALESCE($b[1].qty * $b[1].px, CAST(0.0 AS DOUBLE)) + COALESCE($b[2].qty * $b[2].px, CAST(0.0 AS DOUBLE))) + COALESCE($b[3].qty * $b[3].px, CAST(0.0 AS DOUBLE)))"
      val emptyFills =
        "CAST([] AS STRUCT(ts TIMESTAMP, tid BIGINT, act VARCHAR, qty DOUBLE, px DOUBLE, ic BOOLEAN, etid BIGINT, pnl DOUBLE, rsn VARCHAR, syn BOOLEAN, side VARCHAR)[])"
      val emptyLots =
        "CAST([] AS STRUCT(syn BOOLEAN, tid BIGINT, qty DOUBLE, px DOUBLE)[])"
      // takes over the SORTED book; remaining over the APPEND-order fold
      def take(b: String, i: Int): String = i match {
        case 1 => s"LEAST(list_sort($b)[1].qty, ${r0(b)})"
        case 2 => s"LEAST(list_sort($b)[2].qty, ${r0(b)} - ${take(b, 1)})"
        case _ => s"LEAST(list_sort($b)[3].qty, (${r0(b)} - ${take(b, 1)}) - ${take(b, 2)})"
      }
      def rem(b: String, i: Int): String = i match {
        case 1 => r0(b)
        case 2 => s"(${r0(b)} - ${take(b, 1)})"
        case _ => s"((${r0(b)} - ${take(b, 1)}) - ${take(b, 2)})"
      }
      // fills emitted by a full close of book b at price p (event ts/syn)
      def fills(b: String, short: Boolean, reason: String, nid: String): String = {
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
      def closeCash(b: String, short: Boolean, cash: String): String = {
        val sign = if (short) "-" else "+"
        (1 to 3).foldLeft(cash) { (acc, i) =>
          s"($acc $sign (CASE WHEN len($b) >= $i AND ${rem(b, i)} > CAST(1e-12 AS DOUBLE) THEN ${take(b, i)} * e_p ELSE CAST(0.0 AS DOUBLE) END))"
        }
      }
      def nFills(b: String): String =
        s"(CASE WHEN len($b) >= 1 AND ${rem(b, 1)} > CAST(1e-12 AS DOUBLE) THEN 1 ELSE 0 END + CASE WHEN len($b) >= 2 AND ${rem(b, 2)} > CAST(1e-12 AS DOUBLE) THEN 1 ELSE 0 END + CASE WHEN len($b) >= 3 AND ${rem(b, 3)} > CAST(1e-12 AS DOUBLE) THEN 1 ELSE 0 END)"

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
    }
  )
}
