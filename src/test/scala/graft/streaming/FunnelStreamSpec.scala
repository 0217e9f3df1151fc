package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.FunnelStream.Ev

class FunnelStreamSpec extends AnyFunSuite with TestSpark {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Latest emitted stage row per user from the memory sink. */
  private def latest(table: String) = {
    val s = spark; import s.implicits._
    spark.table(table)
      .withColumn("rn", monotonically_increasing_id())
      .orderBy($"rn".desc).dropDuplicates("user_id")
      .select($"user_id", $"t_view_us", $"t_click_us", $"t_purchase_us", $"stage")
  }

  test("boundary fixture parity: same-ts exclusion, order, box — across batches") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = FunnelStream.funnel(input.toDS())
      .writeStream.format("memory").queryName("fs_fix")
      .outputMode("update").start()
    try {
      // batch 1: u1 converts through click; u2's click shares the view's
      // ts (must NOT count); u3 sees a purchase before any click
      input.addData(
        Ev(1L, ts("2024-01-01 10:00:00"), "view", 1L),
        Ev(1L, ts("2024-01-01 11:00:00"), "click", 2L),
        Ev(2L, ts("2024-01-01 10:00:00"), "view", 3L),
        Ev(2L, ts("2024-01-01 10:00:00"), "click", 4L),
        Ev(3L, ts("2024-01-01 10:00:00"), "view", 5L),
        Ev(3L, ts("2024-01-01 10:30:00"), "purchase", 6L))
      q.processAllAvailable()
      // batch 2: u1's purchase completes the funnel; u3's click arrives
      // but its earlier purchase stays unqualified; u1's SECOND view
      // must not move t_view
      input.addData(
        Ev(1L, ts("2024-01-01 12:00:00"), "purchase", 7L),
        Ev(1L, ts("2024-01-01 12:30:00"), "view", 8L),
        Ev(3L, ts("2024-01-01 11:00:00"), "click", 9L))
      q.processAllAvailable()
      // batch 3: an event past u1's 36h box is ignored entirely
      input.addData(Ev(2L, ts("2024-01-03 10:00:01"), "click", 10L))
      q.processAllAvailable()
      val out = latest("fs_fix").collect()
        .map(r => r.getLong(0) -> ((r.get(1) != null, r.get(2) != null,
          r.get(3) != null, r.getInt(4)))).toMap
      assert(out(1L) === ((true, true, true, 3)))
      assert(out(2L) === ((true, false, false, 1))) // same-ts + boxed-out
      assert(out(3L) === ((true, true, false, 2)))  // purchase-before-click
    } finally q.stop()
  }

  test("funnelSessions: in-box parity, state eviction past watermark, re-open") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = FunnelStream.funnelSessions(input.toDS(), boxHours = 36,
        lateness = "1 hour")
      .writeStream.format("memory").queryName("fs_sess")
      .outputMode("update").start()
    try {
      // batch 1: u1 converts fully inside its box; u2's click shares the
      // view's ts (must NOT count) — the same fold as the lifetime form
      input.addData(
        Ev(1L, ts("2024-01-01 10:00:00"), "view", 1L),
        Ev(1L, ts("2024-01-01 11:00:00"), "click", 2L),
        Ev(1L, ts("2024-01-01 12:00:00"), "purchase", 3L),
        Ev(2L, ts("2024-01-01 10:00:00"), "view", 4L),
        Ev(2L, ts("2024-01-01 10:00:00"), "click", 5L))
      q.processAllAvailable()
      // batch 2: a far-future u3 event drags the watermark past both
      // boxes (close = Jan 2 22:00; watermark = Jan 10 - 1h lateness)
      input.addData(Ev(3L, ts("2024-01-10 00:00:00"), "view", 6L))
      q.processAllAvailable()
      // batch 3: runs with the advanced watermark — u1/u2 time out
      input.addData(Ev(3L, ts("2024-01-10 00:00:01"), "click", 7L))
      q.processAllAvailable()
      val stateRows = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      assert(stateRows === 1L, "u1/u2 state must evict; only u3 remains")
      // batch 4: u1 re-appears AFTER eviction — a NEW session (fresh t0),
      // not a mutation of the closed one
      input.addData(Ev(1L, ts("2024-01-10 05:00:00"), "view", 8L))
      q.processAllAvailable()
      val out = spark.table("fs_sess")
        .select($"user_id", $"t0_us", $"t_view_us", $"t_click_us",
          $"t_purchase_us", $"stage").collect()
        .groupBy(r => (r.getLong(0), r.getLong(1)))
        .view.mapValues(_.last).toMap
      val d1 = FunnelStream.micros(ts("2024-01-01 10:00:00"))
      assert(out((1L, d1)).getInt(5) === 3)            // closed session intact
      assert(out((2L, d1)).getInt(5) === 1)            // same-ts click excluded
      val d2 = FunnelStream.micros(ts("2024-01-10 05:00:00"))
      assert(out((1L, d2)).getInt(5) === 1)            // re-opened session
      assert(out((1L, d2)).getLong(1) === d2)
    } finally q.stop()
  }

  test("sessionize: batch walk matches the streamed sessions (timely eviction)") {
    // the funnelSessions fixture replayed through the batch twin: same
    // greedy boxes, same per-session folds — equality holds because the
    // fixture's eviction was timely (each re-open arrived after the
    // previous session's close passed the watermark)
    val boxUs = 36L * 3600000000L
    def run(evs: Ev*) = FunnelStream.sessionize(evs.head.user_id,
      evs.toArray.sortBy(e => (FunnelStream.micros(e.ts), e.event_id)), boxUs)
      .map(s => s.t0_us -> ((s.t_view_us.isDefined, s.t_click_us.isDefined,
        s.t_purchase_us.isDefined, s.stage))).toMap
    val u1 = run(
      Ev(1L, ts("2024-01-01 10:00:00"), "view", 1L),
      Ev(1L, ts("2024-01-01 11:00:00"), "click", 2L),
      Ev(1L, ts("2024-01-01 12:00:00"), "purchase", 3L),
      Ev(1L, ts("2024-01-10 05:00:00"), "view", 8L))
    assert(u1(FunnelStream.micros(ts("2024-01-01 10:00:00"))) ===
      ((true, true, true, 3)))
    assert(u1(FunnelStream.micros(ts("2024-01-10 05:00:00"))) ===
      ((true, false, false, 1)))
    // same-ts click still excluded inside a session; a post-box click
    // opens a NEW session at stage 0 (click with no prior view)
    val u2 = run(
      Ev(2L, ts("2024-01-01 10:00:00"), "view", 4L),
      Ev(2L, ts("2024-01-01 10:00:00"), "click", 5L),
      Ev(2L, ts("2024-01-03 10:00:01"), "click", 10L))
    assert(u2(FunnelStream.micros(ts("2024-01-01 10:00:00"))) ===
      ((true, false, false, 1)))
    assert(u2(FunnelStream.micros(ts("2024-01-03 10:00:01"))) ===
      ((false, false, false, 0)))
  }

  test("testdata parity: chronological micro-batches reproduce batch q193 exactly") {
    val s = spark; import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val evs = graft.Tables.load(spark, dir, "events")
      .select($"user_id", $"ts", $"event_type", $"event_id")
      .as[Ev].collect().sortBy(e => (FunnelStream.micros(e.ts), e.event_id))
    val input = MemoryStream[Ev]
    val q = FunnelStream.funnel(input.toDS())
      .writeStream.format("memory").queryName("fs_data")
      .outputMode("update").start()
    try {
      evs.grouped(math.max(1, evs.length / 7)).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      val streamed = latest("fs_data").collect()
        .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
          Option(r.get(3)), r.getInt(4)))).toMap
      val batch = graft.SparkEntry.queries("q193_funnel")(spark, dir)
        .select($"user_id", unix_micros($"t_view").as("v"),
          unix_micros($"t_click").as("c"), unix_micros($"t_purchase").as("p"),
          $"stage")
        .collect()
        .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
          Option(r.get(3)), r.getInt(4)))).toMap
      assert(streamed.keySet === batch.keySet)
      assert(batch.nonEmpty)
      batch.foreach { case (u, exp) =>
        assert(streamed(u) === exp, s"user $u drifted")
      }
    } finally q.stop()
  }
}
