package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-equivalent forms of the streaming semantics in SURVEY.md §2.13,
  * DuckDB-oracled here; the live Structured Streaming path (readStream +
  * watermark + flatMapGroupsWithState) lives in graft.streaming and is
  * spec-tested with MemoryStream.
  *
  *  - q60: sliding event-time window aggregation (1h window, 30min slide)
  *    — the rolling-history aggregate of real_time_extractor.py:115-179
  *  - q61: same-bar dedup gate (run_auto_trader.py:3970-3990) —
  *    keep-first per (user, bucket), i.e. dropDuplicates semantics made
  *    deterministic via row_number
  *  - q62: volatility-spike alert (real_time_extractor.py:289-333):
  *    |Δprice| > k·rolling σ over the prior 20 ticks
  *  - q188: event-time sessionization — Spark's native `session_window`
  *    (30-min gap) per user, the batch form of the streaming session
  *    aggregation (real_time_extractor.py's per-connection activity
  *    bursts). Two events share a session iff the gap between them is
  *    AT MOST 30 min — session_window merges at exactly the gap
  *    (inclusive; pinned by StreamingSpec's boundary case) — and
  *    session end = last event + gap, exactly session_window's `.end`.
  */
object StreamQueries extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    "q60_sliding_window" -> ((s, dir) => {
      import s.implicits._
      graft.Tables.load(s, dir, "events")
        .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), Det.dsum($"value").as("sum_value"))
        .select($"w.start".as("ws"), $"w.end".as("we"), $"event_type", $"n", $"sum_value")
    }),

    "q61_dedup_gate" -> ((s, dir) => {
      import s.implicits._
      val bucket = (floor(unix_timestamp($"ts") / 1800) * 1800).cast("long")
      val w = Window.partitionBy($"user_id", $"bucket").orderBy($"ts", $"event_id")
      graft.Tables.load(s, dir, "events")
        .withColumn("bucket", bucket)
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"user_id", $"bucket", $"event_id".as("first_event"))
    }),

    // Chunked-halo rolling σ: partitionBy(event_type) would cap the
    // window at |event types| tasks — ChunkedWindow keeps the alert scan
    // row-parallel at 100 TB with hash-identical output (exact decimal
    // prefix sums; lag(1) = kernel `prev`).
    "q62_vol_alert" -> ((s, dir) => {
      import s.implicits._
      val m = graft.operators.ChunkedWindow.rollingMoments(
        graft.Tables.load(s, dir, "events").withColumn("t", unix_micros($"ts")),
        "event_type", "t", "event_id", "value", lo = -20, hi = -1).toDF()
      val n = $"n".cast("double")
      val delta = $"x" - $"prev"
      val sigma = when($"n" > 1,
        sqrt(greatest((n * $"s2" - $"s1" * $"s1") / (n * (n - lit(1.0))), lit(0.0))))
      m.select($"key".as("event_type"), $"seq".as("event_id"),
          delta.as("delta"), sigma.as("sigma"))
        .where($"delta".isNotNull && $"sigma".isNotNull && $"sigma" > 0 &&
          abs($"delta") > lit(2.0) * $"sigma")
    }),

    // Sessionization: the one event-time operator Spark ships whole —
    // groupBy(session_window) is a single shuffle on (user, merged
    // window), no self-join, no global sort; the SAME session_window
    // expression runs under readStream for the live path (StreamingSpec
    // session-parity test; countDistinct stays batch-only — streaming
    // aggregation does not support exact distinct). Aggregates stay
    // deterministic: counts + Det.dsum over the RAW value column.
    "q188_sessionize" -> ((s, dir) => {
      import s.implicits._
      graft.Tables.load(s, dir, "events")
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"event_type").as("n_types"),
          Det.dsum($"value").as("sum_value"))
        .select($"user_id", $"w.start".as("ws"), $"w.end".as("we"),
          $"n_events", $"n_types", $"sum_value")
    })
  )

  override def oracles: Map[String, String] = Map(
    "q60_sliding_window" ->
      s"""WITH exploded AS (
         |  SELECT event_type, value,
         |    CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - k * 1800 AS ws_epoch
         |  FROM events, (SELECT unnest([0, 1]) AS k) ks)
         |SELECT CAST(to_timestamp(ws_epoch) AS TIMESTAMP) AS ws,
         |  CAST(to_timestamp(ws_epoch + 3600) AS TIMESTAMP) AS we,
         |  event_type, COUNT(*) AS n,
         |  ${Det.sqlSum("value")} AS sum_value
         |FROM exploded GROUP BY 1, 2, 3""".stripMargin,
    "q61_dedup_gate" ->
      """WITH bucketed AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 AS bucket,
        |    row_number() OVER (
        |      PARTITION BY user_id, CAST(floor(epoch(ts) / 1800) AS BIGINT)
        |      ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, bucket, event_id AS first_event
        |FROM bucketed WHERE rn = 1""".stripMargin,
    "q62_vol_alert" -> {
      val over = "PARTITION BY event_type ORDER BY ts, event_id"
      val f = "ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING"
      val n = s"COUNT(value) OVER ($over $f)"
      val sx = s"CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER ($over $f) AS DOUBLE)"
      val q6 = Det.sqlQfloor("value", "1e6")
      val sx2 = s"(CAST(SUM(CAST($q6 AS HUGEINT) * CAST($q6 AS HUGEINT)) OVER ($over $f) AS DOUBLE) / 1e12)"
      s"""WITH lagged AS (
         |  SELECT event_type, event_id, ts, value,
         |    value - lag(value, 1) OVER ($over) AS delta,
         |    CASE WHEN $n > 1 THEN sqrt(greatest(
         |      (CAST($n AS DOUBLE)*$sx2 - $sx*$sx)
         |        / (CAST($n AS DOUBLE)*(CAST($n AS DOUBLE)-1.0)), 0.0)) END AS sigma
         |  FROM events)
         |SELECT event_type, event_id, delta, sigma
         |FROM lagged
         |WHERE delta IS NOT NULL AND sigma IS NOT NULL AND sigma > 0
         |  AND abs(delta) > 2.0 * sigma""".stripMargin
    },
    // Gaps-and-islands replay of session_window: a session breaks when
    // the gap to the previous event is STRICTLY over 30 min (exactly 30
    // still merges — inclusive boundary, StreamingSpec-pinned); end =
    // last event + the gap. Micros arithmetic — events.ts carries
    // sub-second precision.
    "q188_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, ts, event_id, event_type, value,
         |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
         |        PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
         |      OR lag(ts) OVER (
         |        PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |    THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |islands AS (
         |  SELECT user_id, ts, event_type, value,
         |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM flagged)
         |SELECT user_id,
         |  MIN(ts) AS ws,
         |  MAX(ts) + INTERVAL 30 MINUTE AS we,
         |  COUNT(*) AS n_events,
         |  COUNT(DISTINCT event_type) AS n_types,
         |  ${Det.sqlSum("value")} AS sum_value
         |FROM islands GROUP BY user_id, sess""".stripMargin
  )
}
