package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DashboardSpec extends AnyFunSuite with TestSpark {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("positions replay: weighted-avg adds, partial keeps entry, exact close resets, flip re-marks") {
    val s = spark
    import s.implicits._
    // one ticker walks every branch of the reference state machine
    val execs = Seq(
      ("W", ts(0), 1L, "BUY", 10.0, 100.0),  // flat → long 10 @ 100
      ("W", ts(1), 2L, "BUY", 10.0, 110.0),  // same side → 20 @ 105 (weighted)
      ("W", ts(2), 3L, "SELL", 5.0, 120.0),  // partial → 15, entry stays 105
      ("W", ts(3), 4L, "SELL", 15.0, 90.0),  // exact close → flat, entry reset
      ("W", ts(4), 5L, "SELL", 4.0, 80.0),   // flat → short 4 @ 80
      ("W", ts(5), 6L, "BUY", 10.0, 70.0),   // flip: |q|>|pos| → long 6 @ 70
      // second ticker ends flat: must not appear in the output
      ("F", ts(0), 7L, "BUY", 3.0, 10.0),
      ("F", ts(1), 8L, "SELL", 3.0, 12.0)
    ).toDF("ticker", "ts", "event_id", "action", "qty", "price")
    val out = DashboardQueries.replayPositions(execs).collect()
    assert(out.length === 1, "flat ticker F excluded")
    val w = out.head
    assert(w.getAs[String]("ticker") === "W")
    assert(w.getAs[Int]("shares") === 6)
    assert(w.getAs[Double]("entry_price") === 70.0)
    // latest BUY price (70) is the mark
    assert(w.getAs[Double]("current_price") === 70.0)
    assert(w.getAs[Double]("market_value") === 420.0)
    assert(math.abs(w.getAs[Double]("unrealized_pnl_pct")) < 1e-12) // cur == entry
  }

  test("positions routing: fresh snapshot, stale fallback, missing-table fallback") {
    val s = spark
    import s.implicits._
    val positions = Seq(
      ("W", Timestamp.valueOf("2024-01-10 00:00:00"), 5.0),
      ("W", Timestamp.valueOf("2024-01-11 00:00:00"), 7.0))
      .toDF("ticker", "position_date", "shares")
    val execs = Seq(("W", ts(0), 1L, "BUY", 2.0, 50.0))
      .toDF("ticker", "ts", "event_id", "action", "qty", "price")

    // fresh: asOf one day after the latest snapshot, max age 3 days
    val (fresh, tagF) = DashboardQueries.positionsRouted(positions, execs,
      Timestamp.valueOf("2024-01-12 00:00:00"), maxAgeDays = 3.0)
    assert(tagF === "portfolio_positions")
    val rows = fresh.collect()
    assert(rows.length === 1 && rows.head.getAs[Double]("shares") === 7.0)

    // stale: same table, asOf far in the future
    val (stale, tagS) = DashboardQueries.positionsRouted(positions, execs,
      Timestamp.valueOf("2024-03-01 00:00:00"), maxAgeDays = 3.0)
    assert(tagS === "trade_executions_fallback_stale")
    assert(stale.collect().head.getAs[Int]("shares") === 2)

    // missing: empty positions table routes to the plain fallback
    val (missing, tagM) = DashboardQueries.positionsRouted(
      positions.where(lit(false)), execs,
      Timestamp.valueOf("2024-01-12 00:00:00"), maxAgeDays = 3.0)
    assert(tagM === "trade_executions_fallback")
    assert(missing.collect().head.getAs[Int]("shares") === 2)
  }
}
