package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable.ListBuffer
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SessionEvent(user_id: Long, ts: Timestamp, event_type: String)

/** Mutable per-user state: the currently open session. */
case class OpenSession(startMs: Long, endMs: Long, n: Int)

/** A closed session. */
case class Session(user_id: Long, session_start: Timestamp,
                   session_end: Timestamp, n_events: Int)

/** Gap-based sessionization with custom state
  * (`flatMapGroupsWithState`) — the Structured Streaming idiom for the
  * stateful per-key logic that windowed aggregation can't express.
  *
  * A session closes when `gapMs` passes with no event for that user;
  * closed sessions are emitted in Append mode, and the open session is
  * flushed by an event-time timeout once the watermark passes
  * `session_end + gap`. State per key is one small case class, so the
  * state store stays bounded by active-user count, not event volume.
  */
object Sessionize {

  def sessions(ds: Dataset[SessionEvent], gapMs: Long,
               watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, events: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          def close(s: OpenSession) =
            Session(uid, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n)

          if (events.isEmpty && state.hasTimedOut) {
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            val out = ListBuffer.empty[Session]
            var cur = state.getOption
            // Late stragglers entirely before the open session (gap
            // exceeded on the early side): their gap horizon has already
            // passed, so they close within this batch — but consecutive
            // stragglers within gapMs of EACH OTHER still form one
            // session, not per-event singletons. Since events are sorted,
            // all stragglers precede the first in-session event; `early`
            // accumulates the current straggler chain.
            var early: Option[OpenSession] = None
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // Within the gap of EITHER session bound — a late event
                // from a previous batch can legally precede the open
                // session's start, so the start must extend backwards too.
                case Some(s) if t >= s.startMs - gapMs && t - s.endMs <= gapMs =>
                  cur = Some(s.copy(startMs = math.min(s.startMs, t),
                    endMs = math.max(s.endMs, t), n = s.n + 1))
                case Some(s) if t < s.startMs - gapMs =>
                  early match {
                    case Some(es) if t - es.endMs <= gapMs =>
                      early = Some(es.copy(endMs = t, n = es.n + 1))
                    case Some(es) =>
                      out += close(es)
                      early = Some(OpenSession(t, t, 1))
                    case None =>
                      early = Some(OpenSession(t, t, 1))
                  }
                case Some(s) =>
                  out += close(s)
                  cur = Some(OpenSession(t, t, 1))
                case None =>
                  cur = Some(OpenSession(t, t, 1))
              }
            }
            early.foreach(es => out += close(es))
            cur.foreach { s =>
              state.update(s)
              if (!state.hasTimedOut) {
                // Spark rejects a timeout at-or-before the current
                // watermark (IllegalArgumentException, failing the whole
                // batch). A group whose events arrived just inside the
                // watermark can legally produce endMs + gap <= watermark:
                // clamp so the session times out on the next trigger
                // instead of crashing the query.
                val wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(math.max(s.endMs + gapMs, wm + 1))
              }
            }
            out.iterator
          }
      }
  }
}
