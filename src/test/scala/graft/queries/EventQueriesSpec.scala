package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.BloomDedup

/** Pins the boundary semantics of the event-analytics trio (q193–q195)
  * and the BloomDedup contract (q196) on hand-built fixtures — the
  * oracle gates prove engine parity; these prove the SEMANTICS are the
  * ones documented.
  */
class EventQueriesSpec extends AnyFunSuite with TestSpark {

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Events fixture → the q193 window pipeline, minus the table load. */
  private def funnel(rows: Seq[(Long, String, String, Long)]) = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = rows.map { case (u, t, e, id) => (u, ts(t), e, id) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val firstTouch = all.groupBy($"user_id").agg(min($"ts").as("t0"))
    all.join(firstTouch, "user_id")
      .where($"ts" < $"t0" + expr("INTERVAL 36 HOURS"))
      .withColumn("vm", min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("ck", when($"event_type" === "click" && $"vm" < $"ts", $"ts"))
      .withColumn("cm", min($"ck").over(w))
      .withColumn("pk",
        when($"event_type" === "purchase" && $"cm" < $"ts", $"ts"))
      .groupBy($"user_id")
      .agg(min(when($"event_type" === "view", $"ts")).as("t_view"),
        min($"ck").as("t_click"), min($"pk").as("t_purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.get(1) != null, r.get(2) != null, r.get(3) != null)).toMap
  }

  test("q208 sessionize: AT-boundary event opens a new session; one shuffle") {
    import graft.streaming.FunnelStream
    import graft.streaming.FunnelStream.Ev
    val boxUs = 36L * 3600000000L
    // an event EXACTLY at t0 + 36h is outside the box (strict <) and
    // must open session 2 at its own timestamp
    val evs = Array(
      Ev(7L, ts("2024-01-01 10:00:00"), "view", 1L),
      Ev(7L, ts("2024-01-02 22:00:00"), "view", 2L))
    val out = FunnelStream.sessionize(7L, evs, boxUs).toSeq
    assert(out.map(_.t0_us) === Seq(
      FunnelStream.micros(ts("2024-01-01 10:00:00")),
      FunnelStream.micros(ts("2024-01-02 22:00:00"))))
    assert(out.forall(_.stage === 1))
    // plan shape: the whole query is ONE user_id exchange — the session
    // walk adds no shuffle beyond the groupByKey
    val p = graft.SparkEntry.queries("q208_funnel_sessions")(
      spark, "/root/testdata/sf0.001").queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    // formatted mode prints each node twice (tree + detail header);
    // count the "(n) Exchange" detail headers only
    val nEx = p.linesIterator.count(_.matches("\\(\\d+\\) Exchange.*"))
    assert(nEx === 1, s"q208 must shuffle exactly once on user_id:\n$p")
  }

  test("funnel steps require STRICTLY later timestamps, in order") {
    val res = funnel(Seq(
      // u1: clean conversion view < click < purchase
      (1L, "2024-01-01 10:00:00", "view", 1L),
      (1L, "2024-01-01 11:00:00", "click", 2L),
      (1L, "2024-01-01 12:00:00", "purchase", 3L),
      // u2: click at the SAME instant as view — does not count
      (2L, "2024-01-01 10:00:00", "view", 4L),
      (2L, "2024-01-01 10:00:00", "click", 5L),
      // u3: purchase BEFORE any click — stage stops at click
      (3L, "2024-01-01 10:00:00", "view", 6L),
      (3L, "2024-01-01 10:30:00", "purchase", 7L),
      (3L, "2024-01-01 11:00:00", "click", 8L),
      // u4: click before any view — never a funnel click
      (4L, "2024-01-01 09:00:00", "click", 9L),
      (4L, "2024-01-01 10:00:00", "view", 10L)))
    assert(res(1L) === ((true, true, true)))
    assert(res(2L) === ((true, false, false)))
    assert(res(3L) === ((true, true, false)))
    assert(res(4L) === ((true, false, false)))
  }

  test("funnel is time-boxed to 36h after the user's first touch") {
    val res = funnel(Seq(
      (1L, "2024-01-01 00:00:00", "view", 1L),
      (1L, "2024-01-01 01:00:00", "click", 2L),
      // purchase lands 37h after first touch — outside the box
      (1L, "2024-01-02 13:00:00", "purchase", 3L)))
    assert(res(1L) === ((true, true, false)))
  }

  test("SCD2 islands split on every type change and chain valid_to") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 10:00:00", "a", 1L),
      (1L, "2024-01-01 11:00:00", "a", 2L),
      (1L, "2024-01-01 12:00:00", "b", 3L),
      (1L, "2024-01-01 13:00:00", "a", 4L))
      .map { case (u, t, e, id) => (u, ts(t), e, id) }
      .toDF("user_id", "ts", "event_type", "event_id")
      .createOrReplaceTempView("ev_scd2_fixture")
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byIsland = Window.partitionBy($"user_id").orderBy($"island")
    val out = spark.table("ev_scd2_fixture")
      .withColumn("prev", lag($"event_type", 1).over(ord))
      .withColumn("chg",
        when($"prev".isNull || $"prev" =!= $"event_type", 1L).otherwise(0L))
      .withColumn("island", sum($"chg").over(run))
      .groupBy($"user_id", $"island", $"event_type")
      .agg(min($"ts").as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead($"valid_from", 1).over(byIsland))
      .orderBy($"island").collect()
    assert(out.length === 3) // a(2 events), b, a — revisits reopen
    assert(out.map(_.getString(2)).toSeq === Seq("a", "b", "a"))
    assert(out.map(_.getLong(4)).toSeq === Seq(2L, 1L, 1L)) // n_events
    // valid_to = next island's valid_from; last interval open
    assert(out(0).getTimestamp(5) === out(1).getTimestamp(3))
    assert(out(1).getTimestamp(5) === out(2).getTimestamp(3))
    assert(out(2).get(5) == null)
  }

  test("attribution picks the NEXT purchase, strictly after, within 2h") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      // u1: click at 10:00; purchases at 09:00 (before — ignored),
      // 11:00 (next — attributed), 12:00 (later — not picked)
      (1L, "2024-01-01 09:00:00", "purchase", 1L),
      (1L, "2024-01-01 10:00:00", "click", 2L),
      (1L, "2024-01-01 11:00:00", "purchase", 3L),
      (1L, "2024-01-01 12:00:00", "purchase", 4L),
      // u2: next purchase is 2h + 1s away — outside tolerance
      (2L, "2024-01-01 10:00:00", "click", 5L),
      (2L, "2024-01-01 12:00:01", "purchase", 6L),
      // u3: purchase at the SAME ts with LOWER event_id sorts before
      // the click — not "after", so unattributed
      (3L, "2024-01-01 10:00:00", "purchase", 7L),
      (3L, "2024-01-01 10:00:00", "click", 8L))
      .map { case (u, t, e, id) => (u, ts(t), e, id) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"event_id".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val key = concat(lpad(unix_micros($"ts").cast("string"), 20, "0"),
      lit("-"), lpad($"event_id".cast("string"), 10, "0"))
    val out = df
      .withColumn("nxt", min(when($"event_type" === "purchase", key)).over(w))
      .where($"event_type" === "click")
      .withColumn("p_us", substring($"nxt", 1, 20).cast("long"))
      .select($"user_id",
        when($"p_us" - unix_micros($"ts") <= 7200000000L,
          substring($"nxt", 22, 10).cast("long")).as("purchase_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) === Some(3L)) // next, not earliest or latest
    assert(out(2L) === None)     // outside the 2h box
    assert(out(3L) === None)     // same-ts lower-id is not "after"
  }

  test("BloomDedup never false-negatives and positions are in-range") {
    import spark.implicits._
    val hist = (1 to 50).map(i => s"key-$i").toDF("k")
    val filter = BloomDedup.build(hist)
    // every history key must hit its own filter
    val self = BloomDedup.probe(hist.withColumn("id", $"k"), filter, "id")
    assert(self.where(!$"bloom_hit").count() === 0)
    // positions live in [0, B)
    val ps = filter.agg(min($"p"), max($"p")).head()
    assert(ps.getLong(0) >= 0L && ps.getLong(1) < BloomDedup.DefaultB)
    // a probe of fresh keys is not all-hit at this fill factor
    val fresh = (1 to 50).map(i => s"other-$i").toDF("k")
      .withColumn("id", $"k")
    assert(BloomDedup.probe(fresh, filter, "id")
      .where($"bloom_hit").count() < 50)
  }
}
