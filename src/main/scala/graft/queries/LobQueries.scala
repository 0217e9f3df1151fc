package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.exec.LobSim

/** Order row fed to the LOB fill kernel (one per (ticker, day)). */
final case class LobOrder(
    ticker: String, ts: Timestamp, buy: Boolean, shares: Double,
    half_spread: Double, depth: Double, slip0: Double, mid: Double)

/** One fill result per order — the kernel's Fill fields, flattened. */
final case class LobFillRow(
    ticker: String, ts: Timestamp, requested: Double, vwap: Double,
    mid: Double, start_price: Double, levels: Int, exhausted: Boolean,
    slip_bps: Double)

/** The limit-order-book market-order fill simulator under the oracle
  * gate (reference execution/lob_simulator.py:51-170).
  *
  * q180 runs the REAL [[LobSim.marketOrderFill]] over a deterministic
  * per-(ticker, day) order tape and the oracle replays the ENTIRE
  * 10-level book walk as a recursive CTE whose rows carry the walk
  * state (remaining shares, accumulated cost, levels consumed) — the
  * sequential `remaining -= fill; totalCost += fill·px` double folds
  * have no order-free closed form, so the recursion mirrors them
  * step-for-step in IEEE order. The order tape steers every reachable
  * branch: di%13 → shares=0 (degenerate mid-fill return), di%11 →
  * depth=0 (exhausted-at-start tail fill), depth factors 0.5/0.75 →
  * partial-book exhaustion through the deep-tail penalty, 1.0/1.25 →
  * in-book fills; buy and sell sides alternate by day parity. (The
  * mid<=0 branch is unreachable on this data — testdata prices are
  * strictly positive — and stays spec-covered in LobSimSpec.)
  *
  * Cross-engine float note: the level weights e^(−0.8·i) ride each
  * engine's libm EXP (the documented q171/q174-class dependency — no
  * replayable IEEE exp exists); everything else is plain IEEE
  * arithmetic mirrored operation-for-operation, including the
  * left-associated weight-sum fold.
  */
object LobQueries extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    "q180_lob_fills" -> ((s, dir) => {
      import s.implicits._
      val ev = Bars.of(s, dir)
        .groupBy($"ticker", $"day")
        .agg(Det.davg($"price").as("mid"),
          (max($"price") - min($"price")).as("atr0"))
        .withColumn("di", row_number()
          .over(Window.partitionBy($"ticker").orderBy($"day")).cast("int"))
      val shares0 = lit(100.0) + lit(10.0) * ($"di" % 7)
      val orders = ev.select(
        $"ticker", $"day".as("ts"),
        ($"di" % 2 === 0).as("buy"),
        when($"di" % 13 === 0, lit(0.0)).otherwise(shares0).as("shares"),
        (lit(0.05) * $"atr0").as("half_spread"),
        when($"di" % 11 === 0, lit(0.0))
          .otherwise(($"mid" * shares0) * (lit(0.5) + lit(0.25) * ($"di" % 4)))
          .as("depth"),
        (lit(0.001) * $"mid").as("slip0"),
        $"mid")
      orders.as[LobOrder].map { o =>
        val f = LobSim.marketOrderFill(
          buy = o.buy, midPrice = o.mid, shares = o.shares,
          halfSpread = o.half_spread, depthNotional = o.depth,
          baselineSlippage = o.slip0)
        LobFillRow(o.ticker, o.ts, f.requestedShares, f.vwapPrice,
          f.midPrice, f.startPrice, f.levelsConsumed, f.exhausted,
          f.midSlippageBps)
      }.toDF()
    })
  )

  override def oracles: Map[String, String] = Map(
    "q180_lob_fills" -> {
      // left-associated weight-sum fold, exactly Array[Double].sum's order
      val wsum = (0 to 9)
        .map(i => s"EXP(CAST(-0.8 AS DOUBLE) * $i)").mkString(" + ")
      s"""${Bars.sql.replace("WITH bars", "WITH RECURSIVE bars")},
         |d1 AS MATERIALIZED (
         |  SELECT ticker, day, ${Det.sqlAvg("price")} AS mid,
         |         MAX(price) - MIN(price) AS atr0
         |  FROM bars GROUP BY ticker, day),
         |ords AS MATERIALIZED (
         |  SELECT ticker, day AS ts, di % 2 = 0 AS buy,
         |    CAST(100.0 AS DOUBLE) + CAST(10.0 AS DOUBLE) * (di % 7) AS shares0,
         |    CASE WHEN di % 13 = 0 THEN CAST(0.0 AS DOUBLE) ELSE shares0 END AS shares,
         |    CAST(0.05 AS DOUBLE) * atr0 AS hs,
         |    CASE WHEN di % 11 = 0 THEN CAST(0.0 AS DOUBLE)
         |      ELSE (mid * shares0) * (CAST(0.5 AS DOUBLE) + CAST(0.25 AS DOUBLE) * (di % 4))
         |    END AS depth,
         |    CAST(0.001 AS DOUBLE) * mid AS base, mid,
         |    (mid * CAST(1.0 AS DOUBLE)) / 1e4 AS tick
         |  FROM (SELECT *, CAST(row_number() OVER (PARTITION BY ticker ORDER BY day) AS INT) AS di FROM d1)),
         |ords2 AS MATERIALIZED (
         |  SELECT *,
         |    GREATEST(CASE WHEN buy THEN (mid + abs(hs)) + abs(base)
         |                  ELSE (mid - abs(hs)) - abs(base) END, tick) AS start_px
         |  FROM ords),
         |walk AS (
         |  SELECT ticker, ts, 0 AS i, shares AS remaining,
         |    CAST(0.0 AS DOUBLE) AS cost, 0 AS consumed
         |  FROM ords2 WHERE shares > 0 AND mid > 0 AND depth > 0
         |  UNION ALL
         |  SELECT ticker, ts, i + 1,
         |    CASE WHEN remaining > 0 THEN remaining - LEAST(remaining, cap) ELSE remaining END,
         |    CASE WHEN remaining > 0 THEN cost + LEAST(remaining, cap) * px ELSE cost END,
         |    CASE WHEN remaining > 0 THEN i + 1 ELSE consumed END
         |  FROM (
         |    SELECT w.ticker, w.ts, w.i, w.remaining, w.cost, w.consumed,
         |      CASE WHEN o.buy THEN o.start_px + w.i * o.tick
         |           ELSE GREATEST(o.tick, o.start_px - w.i * o.tick) END AS px,
         |      (o.depth * (EXP(CAST(-0.8 AS DOUBLE) * w.i) / ($wsum))) / px AS cap
         |    FROM walk w JOIN ords2 o ON o.ticker = w.ticker AND o.ts = w.ts
         |    WHERE w.i < 10) q),
         |fin AS (
         |  SELECT ticker, ts, remaining, cost, consumed
         |  FROM walk WHERE i = 10),
         |res AS (
         |  SELECT o.ticker, o.ts,
         |    CASE WHEN o.shares <= 0 OR o.mid <= 0 THEN GREATEST(CAST(0.0 AS DOUBLE), o.shares)
         |         ELSE o.shares END AS requested,
         |    CASE WHEN o.shares <= 0 OR o.mid <= 0 THEN o.mid
         |         WHEN o.depth <= 0 THEN o.start_px
         |         WHEN f.remaining > 0 THEN (f.cost + f.remaining *
         |             (CASE WHEN o.buy THEN o.start_px + 25 * o.tick
         |                   ELSE GREATEST(o.tick, o.start_px - 25 * o.tick) END)) / o.shares
         |         ELSE f.cost / o.shares END AS vwap,
         |    o.mid,
         |    CASE WHEN o.shares <= 0 OR o.mid <= 0 THEN o.mid ELSE o.start_px END AS start_price,
         |    CASE WHEN o.shares <= 0 OR o.mid <= 0 THEN 0
         |         WHEN o.depth <= 0 THEN 1
         |         WHEN f.remaining > 0 THEN GREATEST(f.consumed, 10)
         |         ELSE f.consumed END AS levels,
         |    CASE WHEN o.shares <= 0 OR o.mid <= 0 THEN false
         |         WHEN o.depth <= 0 THEN true
         |         ELSE f.remaining > 0 END AS exhausted
         |  FROM ords2 o LEFT JOIN fin f ON f.ticker = o.ticker AND f.ts = o.ts)
         |SELECT ticker, ts, requested, vwap, mid, start_price, levels, exhausted,
         |  CASE WHEN mid <= 0 THEN CAST(0.0 AS DOUBLE)
         |       ELSE (vwap - mid) / mid * 1e4 END AS slip_bps
         |FROM res""".stripMargin
    }
  )
}
