package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the continuous form of
  * operators/Sessionize.scala: group each key's event stream into sessions
  * separated by idle gaps, emitting a session exactly once when it CLOSES
  * (a longer gap arrives, or event time moves past the gap horizon).
  *
  * State: one open session per key — O(active keys), bounded by the
  * event-time timeout: a key idle past watermark + gap flushes its open
  * session and drops its state, so abandoned keys cannot accrete. This is
  * the standard flatMapGroupsWithState sessionization recipe (Structured
  * Streaming programming guide's sessionization example is the public
  * ancestor); timeout timestamps are clamped strictly above the current
  * watermark — a timeout <= watermark is an IllegalArgumentException that
  * kills the query (same clamp as StreamingDedup).
  *
  * Determinism caveat inherent to streaming sessionization: rows later than
  * the watermark are dropped by the engine before this operator, so the
  * batch and streaming session sets agree exactly when late data stays
  * within the watermark horizon.
  */
object StreamingSessionize {

  /** One streamed event. */
  final case class Event(userId: Long, eventId: Long, ts: Timestamp)

  /** The open session per key. Public: the state encoder's generated code
    * must reach the constructor. */
  final case class OpenSession(startMs: Long, endMs: Long, n: Long)

  /** A closed session. */
  final case class ClosedSession(userId: Long, startMs: Long, endMs: Long, nEvents: Long)

  /** Sessionize a stream of events keyed by userId with `gapMs` idle gap.
    * Input must already carry a watermark on `ts` (the caller picks the
    * lateness horizon; it must be >= the gap for exact batch parity). */
  def sessions(
      events: Dataset[Event],
      gapMs: Long): Dataset[ClosedSession] = {
    require(gapMs > 0, "session gap must be positive")
    val spark = events.sparkSession
    import spark.implicits._

    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // no event within gap of the watermark → the open session closed
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.startMs, s.endMs, s.n))
          } else {
            // micro-batch order is not event order — sort before folding
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
            val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var open = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.endMs <= gapMs =>
                  open = Some(OpenSession(s.startMs, math.max(s.endMs, t), s.n + 1))
                case Some(s) =>
                  out += ClosedSession(userId, s.startMs, s.endMs, s.n)
                  open = Some(OpenSession(t, t, 1L))
                case None =>
                  open = Some(OpenSession(t, t, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close when event time passes endMs + gap; clamp above the
              // watermark so a zero-progress batch cannot set an illegal
              // (<= watermark) timeout
              state.setTimeoutTimestamp(
                math.max(s.endMs + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }
}
