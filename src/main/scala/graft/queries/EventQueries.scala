package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over the events table — the classic
  * clickstream trio every warehouse engine ships, built as single-
  * shuffle declarative plans (all three partition by `user_id` once;
  * windows and the final aggregate share that one exchange):
  *
  *  - q193 ordered funnel (view → click → purchase): step k counts only
  *    at a STRICTLY later timestamp than the first completion of step
  *    k−1. The sequential constraint is expressed with running-min
  *    windows (min view-ts so far; min qualifying-click-ts so far), so
  *    the whole funnel is one window pass + one aggregate over the same
  *    key — no per-step self-joins (the naive form is k joins of the
  *    full event log; this is one shuffle regardless of k).
  *  - q194 retention cohorts: cohort = first active day per user;
  *    n_active(cohort, day_offset) = distinct users of that cohort
  *    active at that offset. The (user, day) activity set is deduped
  *    map-side BEFORE the cohort join, so the join carries at most one
  *    row per user-day, not the raw event stream.
  *  - q195 SCD2 validity intervals: run-length islands of `event_type`
  *    per user (gaps-and-islands via lag + running sum) collapsed to
  *    [valid_from, valid_to) rows with `valid_to` = the next island's
  *    start — the type-2 slowly-changing-dimension history a MERGE
  *    pipeline materializes. Ordering ties broken by event_id; the
  *    lead() window orders by the island sequence number, which is
  *    strictly increasing, so the output is deterministic even when
  *    adjacent islands share a boundary timestamp.
  *
  * Everything is exact integer / timestamp arithmetic — zero float
  * surface, no Det quantization needed.
  */
object EventQueries extends QueryModule {

  override def queries: Map[String, QFn] = Map(
    "q193_funnel" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = graft.Tables.load(s, dir, "events")
      // time-boxed conversion: only events within 36h of the user's
      // FIRST touch count toward the funnel (the per-user deadline is
      // what makes stage 0–3 all reachable; the extra agg+join shares
      // the window's user_id partitioning)
      val firstTouch = all.groupBy($"user_id").agg(min($"ts").as("t0"))
      val ev = all.join(firstTouch, "user_id")
        .where($"ts" < $"t0" + expr("INTERVAL 36 HOURS"))
        .withColumn("vm", min(when($"event_type" === "view", $"ts")).over(w))
        .withColumn("ck",
          when($"event_type" === "click" && $"vm" < $"ts", $"ts"))
        .withColumn("cm", min($"ck").over(w))
        .withColumn("pk",
          when($"event_type" === "purchase" && $"cm" < $"ts", $"ts"))
      ev.groupBy($"user_id")
        .agg(min(when($"event_type" === "view", $"ts")).as("t_view"),
          min($"ck").as("t_click"),
          min($"pk").as("t_purchase"))
        .select($"user_id", $"t_view", $"t_click", $"t_purchase",
          ($"t_view".isNotNull.cast("int") + $"t_click".isNotNull.cast("int") +
            $"t_purchase".isNotNull.cast("int")).as("stage"))
    }),

    "q194_retention" -> ((s, dir) => {
      import s.implicits._
      val ev = graft.Tables.load(s, dir, "events")
      val first = ev.groupBy($"user_id").agg(min(to_date($"ts")).as("cohort"))
      val act = ev.select($"user_id", to_date($"ts").as("d")).distinct()
      act.join(first, "user_id")
        .groupBy($"cohort", datediff($"d", $"cohort").as("day_offset"))
        .agg(count(lit(1)).as("n_active"))
        // DATE renders engine-differently in the compare; midnight
        // timestamps render identically
        .select($"cohort".cast("timestamp").as("cohort"), $"day_offset",
          $"n_active")
    }),

    // Forward as-of join with tolerance (attribution): each click is
    // attributed to the user's NEXT purchase — the first purchase whose
    // (ts, event_id) is lexicographically after the click's — if it
    // lands within 2 h. The backward as-of (q30 macro join) walks
    // history; this walks forward, and the naive form is a range
    // self-join of the event log against itself. Here it is ONE
    // reverse-ordered running-min window over a sortable string
    // encoding of (epoch_micros, event_id) — zero-pad both so string
    // order = numeric order identically in both engines — so the whole
    // attribution is a single shuffle on user_id.
    "q200_attribution" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val key = concat(lpad(unix_micros($"ts").cast("string"), 20, "0"),
        lit("-"), lpad($"event_id".cast("string"), 10, "0"))
      graft.Tables.load(s, dir, "events")
        .withColumn("nxt",
          min(when($"event_type" === "purchase", key)).over(w))
        .where($"event_type" === "click")
        .withColumn("p_us",
          substring($"nxt", 1, 20).cast("long"))
        .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"),
          when($"p_us" - unix_micros($"ts") <= 7200000000L,
            substring($"nxt", 22, 10).cast("long")).as("purchase_id"),
          when($"p_us" - unix_micros($"ts") <= 7200000000L,
            ($"p_us" - unix_micros($"ts")) / 1000000L).as("latency_sec"))
    }),

    // Next-event Markov transition matrix: per-user lead() pairs →
    // transition counts and row-normalized probabilities — the
    // sequence-model fit every behavioral predictor starts from, and a
    // single shuffle (window + groupBy share the user_id exchange).
    // p is an exact IEEE ratio of exact counts.
    "q204_markov" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val counts = graft.Tables.load(s, dir, "events")
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .where($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("n"))
      counts.withColumn("p", $"n".cast("double") /
        sum($"n").over(Window.partitionBy($"from_type")))
    }),

    // Sessionized funnel (the batch twin of streaming funnelSessions):
    // greedy box sessionization — session k+1 opens at the user's first
    // event at or past t0_k + 36h, so every event lands in exactly one
    // session — then the q193 ordered-funnel fold per session. The
    // session walk is inherently sequential per user, so it runs as one
    // flatMapGroups over the user_id shuffle; per-group memory is the
    // user's OWN event count (~66 rows in testdata at every SF — user
    // cardinality scales with data volume, history per user doesn't),
    // the same bounded-group shape as the bar kernels. The oracle
    // replays the walk as a per-event recursive CTE carrying the
    // current session t0 (depth = max events per user, SF-invariant)
    // and the q193 window idiom per (user, session). All-integer epoch
    // micros — zero float surface.
    "q208_funnel_sessions" -> ((s, dir) => {
      import s.implicits._
      val boxUs = 36L * 3600000000L
      graft.Tables.load(s, dir, "events")
        .select($"user_id", $"ts", $"event_type", $"event_id")
        .as[graft.streaming.FunnelStream.Ev]
        .groupByKey(_.user_id)
        .flatMapGroups { (uid, rows) =>
          val sorted = rows.toArray.sortBy(e =>
            (graft.streaming.FunnelStream.micros(e.ts), e.event_id))
          graft.streaming.FunnelStream.sessionize(uid, sorted, boxUs)
        }
        .toDF()
    }),

    "q195_scd2" -> ((s, dir) => {
      import s.implicits._
      val ord = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val flagged = graft.Tables.load(s, dir, "events")
        .withColumn("prev", lag($"event_type", 1).over(ord))
        .withColumn("chg",
          when($"prev".isNull || $"prev" =!= $"event_type", 1L).otherwise(0L))
        .withColumn("island", sum($"chg").over(run))
      val byIsland = Window.partitionBy($"user_id").orderBy($"island")
      flagged.groupBy($"user_id", $"island", $"event_type")
        .agg(min($"ts").as("valid_from"), count(lit(1)).as("n_events"))
        .withColumn("valid_to", lead($"valid_from", 1).over(byIsland))
        .select($"user_id", $"island", $"event_type", $"valid_from",
          $"valid_to", $"n_events")
    })
  )

  override def oracles: Map[String, String] = Map(
    // the session walk as a linear recursion over each user's ordered
    // event index (depth = max events/user — SF-invariant), then the
    // q193 step idiom partitioned by (user_id, session t0)
    "q208_funnel_sessions" -> {
      val w = "PARTITION BY user_id, t0 ORDER BY tus, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
      s"""WITH RECURSIVE ev AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS rn
         |  FROM events),
         |walk AS (
         |  SELECT user_id, rn, tus, tus AS t0 FROM ev WHERE rn = 1
         |  UNION ALL
         |  SELECT e.user_id, e.rn, e.tus,
         |    CASE WHEN e.tus >= w.t0 + 129600000000 THEN e.tus ELSE w.t0 END
         |  FROM ev e JOIN walk w ON e.user_id = w.user_id AND e.rn = w.rn + 1),
         |se AS (
         |  SELECT e.user_id, e.event_id, e.event_type, e.tus, w.t0
         |  FROM ev e JOIN walk w ON e.user_id = w.user_id AND e.rn = w.rn),
         |v AS (
         |  SELECT *,
         |    min(CASE WHEN event_type = 'view' THEN tus END) OVER ($w) AS vm
         |  FROM se),
         |c AS (
         |  SELECT *, min(ck) OVER ($w) AS cm FROM (
         |    SELECT *, CASE WHEN event_type = 'click' AND vm < tus THEN tus END
         |      AS ck
         |    FROM v)),
         |f AS (
         |  SELECT user_id, t0 AS t0_us,
         |    min(CASE WHEN event_type = 'view' THEN tus END) AS t_view_us,
         |    min(ck) AS t_click_us,
         |    min(CASE WHEN event_type = 'purchase' AND cm < tus THEN tus END)
         |      AS t_purchase_us
         |  FROM c GROUP BY 1, 2)
         |SELECT user_id, t0_us, t_view_us, t_click_us, t_purchase_us,
         |  CAST((t_view_us IS NOT NULL)::INT + (t_click_us IS NOT NULL)::INT +
         |    (t_purchase_us IS NOT NULL)::INT AS INT) AS stage
         |FROM f""".stripMargin
    },

    "q193_funnel" -> {
      val w = "PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
      s"""WITH fa AS (
         |  SELECT user_id, min(ts) AS t0 FROM events GROUP BY 1),
         |e AS (
         |  SELECT ev.* FROM events ev JOIN fa USING (user_id)
         |  WHERE ev.ts < fa.t0 + INTERVAL 36 HOUR),
         |v AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    min(CASE WHEN event_type = 'view' THEN ts END) OVER ($w) AS vm
         |  FROM e),
         |c AS (
         |  SELECT *, min(ck) OVER ($w) AS cm FROM (
         |    SELECT *, CASE WHEN event_type = 'click' AND vm < ts THEN ts END AS ck
         |    FROM v)),
         |f AS (
         |  SELECT user_id,
         |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         |    min(ck) AS t_click,
         |    min(CASE WHEN event_type = 'purchase' AND cm < ts THEN ts END)
         |      AS t_purchase
         |  FROM c GROUP BY 1)
         |SELECT user_id, t_view, t_click, t_purchase,
         |  CAST((t_view IS NOT NULL)::INT + (t_click IS NOT NULL)::INT +
         |    (t_purchase IS NOT NULL)::INT AS INT) AS stage
         |FROM f""".stripMargin
    },
    "q200_attribution" -> {
      val us = "CAST(substr(nxt, 1, 20) AS BIGINT)"
      s"""WITH k AS (
         |  SELECT *, lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '-' ||
         |    lpad(CAST(event_id AS VARCHAR), 10, '0') AS key
         |  FROM events),
         |n AS (
         |  SELECT *, min(CASE WHEN event_type = 'purchase' THEN key END) OVER (
         |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nxt
         |  FROM k)
         |SELECT user_id, event_id AS click_id, ts AS click_ts,
         |  CASE WHEN $us - epoch_us(ts) <= 7200000000
         |       THEN CAST(substr(nxt, 22, 10) AS BIGINT) END AS purchase_id,
         |  CASE WHEN $us - epoch_us(ts) <= 7200000000
         |       THEN ($us - epoch_us(ts)) / 1000000 END AS latency_sec
         |FROM n WHERE event_type = 'click'""".stripMargin
    },
    "q194_retention" ->
      """WITH first AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort
        |  FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
        |SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
        |  CAST(a.d - f.cohort AS INT) AS day_offset,
        |  COUNT(*) AS n_active
        |FROM act a JOIN first f USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q204_markov" ->
      """WITH tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, COUNT(*) AS n
        |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
        |FROM c""".stripMargin,
    "q195_scd2" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |isl AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flagged),
        |iv AS (
        |  SELECT user_id, CAST(island AS BIGINT) AS island, event_type,
        |    min(ts) AS valid_from, COUNT(*) AS n_events
        |  FROM isl GROUP BY 1, 2, 3)
        |SELECT user_id, island, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
        |    AS valid_to,
        |  n_events
        |FROM iv""".stripMargin
  )
}
