package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event as seen by the sessionizer. `ts` stays a timestamp so the
  * watermark column survives into the stateful operator (required for
  * event-time timeout).
  */
final case class SessionEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp) {
  def tsMicros: Long = ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
}

/** Per-user session state kept between micro-batches. `nEvents == 0`
  * marks an IDLE user: no open session, but `sessionId` preserves the
  * next session number so ids stay unique per user across timeouts
  * (matching the batch d4 numbering).
  */
final case class SessionState(
    sessionId: Long,
    startMicros: Long,
    lastMicros: Long,
    nEvents: Long)

/** A closed session — the streaming twin of d4_sessionize's output rows. */
final case class ClosedSession(
    user_id: Long,
    session_id: Long,
    n_events: Long,
    start_micros: Long,
    end_micros: Long)

/** Stateful streaming sessionization via `flatMapGroupsWithState`: the
  * custom-state path of Structured Streaming (SURVEY §2.2 "streaming:
  * state"), complementing the windowed rollup in [[EventStream]].
  *
  * Semantics match the batch d4_sessionize query: a >30-minute gap
  * between a user's consecutive events closes the session. Sessions are
  * emitted when a later event proves the gap, or when the event-time
  * watermark passes last-event + gap (timeout) — so state is bounded by
  * the number of users with open sessions inside the watermark horizon,
  * which is what keeps this runnable forever at 100 TB/day rates.
  */
object EventSessionizer {

  val GapMicros: Long = 30L * 60 * 1000000

  /** Pure per-group transition: fold sorted new events into the open
    * session, emitting every session closed by an observed gap. Exposed
    * for direct unit testing.
    */
  def advance(
      user: Long,
      state: Option[SessionState],
      sorted: Seq[SessionEvent]): (Option[SessionState], List[ClosedSession]) =
    sorted.foldLeft((state, List.empty[ClosedSession])) {
      case ((None, closed), e) =>
        (Some(SessionState(1L, e.tsMicros, e.tsMicros, 1L)), closed)
      case ((Some(st), closed), e) if st.nEvents == 0 => // idle: resume numbering
        (Some(SessionState(st.sessionId, e.tsMicros, e.tsMicros, 1L)), closed)
      case ((Some(st), closed), e) if e.tsMicros - st.lastMicros > GapMicros =>
        val done = ClosedSession(user, st.sessionId, st.nEvents, st.startMicros, st.lastMicros)
        (Some(SessionState(st.sessionId + 1, e.tsMicros, e.tsMicros, 1L)), closed :+ done)
      case ((Some(st), closed), e) =>
        (Some(st.copy(lastMicros = math.max(st.lastMicros, e.tsMicros),
          nEvents = st.nEvents + 1)), closed)
    }

  private def transition(
      user: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      // Watermark passed last-event + gap: the open session closes. Keep
      // an IDLE marker carrying the next session number, so the user's
      // later sessions never reuse an emitted (user_id, session_id) key
      // (the batch d4 twin numbers sessions 1..n per user). The marker is
      // a few dozen bytes per ever-seen user — the price of stable ids.
      val st = state.get
      state.update(SessionState(st.sessionId + 1, 0L, 0L, 0L))
      return Iterator(ClosedSession(user, st.sessionId, st.nEvents, st.startMicros, st.lastMicros))
    }
    val sorted = events.toSeq.sortBy(e => (e.tsMicros, e.event_id))
    val (next, closed) = advance(user, state.getOption, sorted)
    next.foreach { st =>
      state.update(st)
      if (st.nEvents > 0)
        state.setTimeoutTimestamp((st.lastMicros + GapMicros) / 1000 + 1)
    }
    closed.iterator
  }

  /** Wire the sessionizer over a (streaming) events frame. */
  def sessions(events: DataFrame): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(transition)
  }
}
