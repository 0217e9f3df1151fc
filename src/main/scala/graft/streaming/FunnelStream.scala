package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of q193's time-boxed ordered funnel: per-user
  * conversion state (first touch, first view, first qualifying click,
  * first qualifying purchase) maintained via flatMapGroupsWithState,
  * emitting the user's current stage row every micro-batch
  * (OutputMode.Update — downstream MERGEs by user_id).
  *
  * Parity contract with the batch funnel (EventQueries q193), proven
  * by FunnelStreamSpec on both a boundary fixture and real testdata
  * split into chronological micro-batches: step k counts only STRICTLY
  * later than step k−1's first completion, events at or past
  * t0 + boxHours are ignored, and within-batch arrival order is
  * irrelevant (rows re-sort by (event-time micros, event_id) before
  * the fold — micro-batches preserve per-key grouping, not order).
  * Cross-batch the stream assumes in-order event time per user, the
  * same contract as the bar streams: a view arriving in a LATER batch
  * than a click it should have qualified is late data, and the batch
  * form is the backfill remedy.
  *
  * All state times are epoch MICROS (millis would alias the testdata's
  * micro-precision timestamps and break strict `<` comparisons).
  */
object FunnelStream {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, event_id: Long)

  /** -1 = unset; times in epoch micros. */
  final case class FunnelState(t0: Long, tView: Long, tClick: Long,
      tPurchase: Long)

  final case class Stage(user_id: Long, t_view_us: Option[Long],
      t_click_us: Option[Long], t_purchase_us: Option[Long], stage: Int)

  /** [[funnelSessions]] output row — keyed (user_id, t0_us): one row per
    * funnel SESSION, so a user re-appearing after eviction MERGEs as a
    * new session instead of overwriting the closed one. */
  final case class SessionStage(user_id: Long, t0_us: Long,
      t_view_us: Option[Long], t_click_us: Option[Long],
      t_purchase_us: Option[Long], stage: Int)

  def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  def funnel(events: Dataset[Ev], boxHours: Int = 36): Dataset[Stage] = {
    val spark = events.sparkSession
    import spark.implicits._
    val boxUs = boxHours * 3600000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Stage](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[FunnelState]) =>
          val sorted = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
          val st = fold(
            state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, -1L)),
            sorted, boxUs)
          state.update(st)
          def o(v: Long) = if (v >= 0) Some(v) else None
          Iterator.single(Stage(uid, o(st.tView), o(st.tClick), o(st.tPurchase),
            Seq(st.tView, st.tClick, st.tPurchase).count(_ >= 0)))
      }
  }

  /** Shared per-batch fold: events (re-sorted) applied to a funnel state. */
  private def fold(st0: FunnelState, sorted: Array[Ev], boxUs: Long)
      : FunnelState = {
    var st = st0
    sorted.foreach { e =>
      val t = micros(e.ts)
      if (st.t0 < 0) st = st.copy(t0 = t)
      if (t < st.t0 + boxUs) e.event_type match {
        case "view" if st.tView < 0 =>
          st = st.copy(tView = t)
        case "click" if st.tClick < 0 && st.tView >= 0 && st.tView < t =>
          st = st.copy(tClick = t)
        case "purchase"
            if st.tPurchase < 0 && st.tClick >= 0 && st.tClick < t =>
          st = st.copy(tPurchase = t)
        case _ => ()
      }
    }
    st
  }

  /** Batch twin of [[funnelSessions]]: greedy box sessionization of one
    * user's full ordered history — session k+1 opens at the first event
    * at or past t0_k + box, every event lands in exactly one session,
    * and the funnel fold runs per session. This is the BACKFILL form:
    * the stream matches it when eviction is timely (each new session's
    * first event arrives after the previous session's state timed out);
    * a post-box event racing the watermark is dropped by the stream
    * (its state hasn't closed yet) but sessionized here — q208 gates
    * this form against a DuckDB recursive-walk replay. */
  def sessionize(uid: Long, sorted: Array[Ev], boxUs: Long)
      : Iterator[SessionStage] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionStage]
    var i = 0
    while (i < sorted.length) {
      val t0 = micros(sorted(i).ts)
      var j = i
      while (j < sorted.length && micros(sorted(j).ts) < t0 + boxUs) j += 1
      val st = fold(FunnelState(-1L, -1L, -1L, -1L),
        sorted.slice(i, j), boxUs)
      def o(v: Long) = if (v >= 0) Some(v) else None
      out += SessionStage(uid, st.t0, o(st.tView), o(st.tClick),
        o(st.tPurchase), Seq(st.tView, st.tClick, st.tPurchase).count(_ >= 0))
      i = j
    }
    out.iterator
  }

  /** Production-scale form of [[funnel]]: state EVICTS once the
    * event-time watermark passes a funnel's close (t0 + boxHours).
    * [[funnel]] keeps one state row per user FOREVER (NoTimeout) —
    * correct for the lifetime-user parity contract, but an unbounded
    * state store at 100 TB user cardinality. Closing is safe because no
    * event at or past t0 + box can change any step (every step requires
    * t < t0 + box), so the last Update-mode row already carries the
    * final stage when the timeout removes the state.
    *
    * The semantic trade is explicit in the output key: once a user's
    * state is evicted, a later event opens a NEW funnel session (fresh
    * t0) — rows key by (user_id, t0_us), so a downstream MERGE keeps the
    * closed session AND the new one, where [[funnel]] would have ignored
    * every post-box event forever. For a user whose events all fall
    * inside one box, the session row equals the lifetime row
    * (FunnelStreamSpec pins parity, an actual eviction via the state-
    * operator row count, and the re-open). Late data (an event arriving
    * behind the watermark after eviction) re-opens a session rather than
    * silently mutating a closed one; the batch funnel is the backfill
    * remedy, exactly as for the bar streams. */
  def funnelSessions(events: Dataset[Ev], boxHours: Int = 36,
      lateness: String = "1 hour"): Dataset[SessionStage] = {
    val spark = events.sparkSession
    import spark.implicits._
    val boxUs = boxHours * 3600000000L
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, SessionStage](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // Watermark passed t0 + box: nothing can change this funnel;
            // the sink already holds its final row. Drop the state.
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toArray.sortBy(e => (micros(e.ts), e.event_id))
            val st = fold(
              state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, -1L)),
              sorted, boxUs)
            state.update(st)
            // Close at t0 + box (micros → millis, rounded UP so the
            // timeout never fires a microsecond early); the API rejects
            // timestamps at or behind the current watermark, so clamp
            // forward — the state then times out on the next batch.
            val closeMs = (st.t0 + boxUs + 999L) / 1000L
            state.setTimeoutTimestamp(
              math.max(closeMs, state.getCurrentWatermarkMs() + 1L))
            def o(v: Long) = if (v >= 0) Some(v) else None
            Iterator.single(SessionStage(uid, st.t0, o(st.tView),
              o(st.tClick), o(st.tPurchase),
              Seq(st.tView, st.tClick, st.tPurchase).count(_ >= 0)))
          }
      }
  }
}
