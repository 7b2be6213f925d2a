package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming per-user EWMA — the continuous form of the d29 query: fold
  * alpha·x + (1−alpha)·prev over each user's events in exact (ts,
  * event_id) order, one output point per event.
  *
  * Same watermark-sealing construction as StreamingTransitions: events
  * strictly below the watermark are sealed (no later arrival can sort
  * before them — Spark drops sub-watermark rows), the sealed prefix folds
  * through the running EWMA in (µs, event_id) order, and the unsealed
  * suffix stays buffered; an event-time timeout keeps the fold draining
  * while the user is idle. The recursion is the honest sequential
  * semantics — state per user is ONE (seq, ewma) pair plus the
  * horizon-bounded unsealed buffer, so a year-long stream folds in O(1)
  * memory per user.
  */
object StreamingEwma {

  final case class EwmaEvent(userId: Long, eventId: Long, value: Double, ts: Timestamp)

  /** (µs, eventId, value) triples; seq/ewma are the running fold (hasPrev
    * false until the first sealed event). Public for the state encoder. */
  final case class EwmaState(
      buffer: Seq[(Long, Long, Double)], seq: Long, ewma: Double, hasPrev: Boolean)

  /** ewma carries 4-decimal half-up rounding, matching the batch query. */
  final case class EwmaPoint(userId: Long, seq: Long, eventId: Long, ewma: Double)

  def points(
      events: Dataset[EwmaEvent],
      alpha: Double = 0.25): Dataset[EwmaPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val spark = events.sparkSession
    import spark.implicits._

    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          val old = state.getOption.getOrElse(EwmaState(Nil, 0L, 0.0, hasPrev = false))
          val all = old.buffer ++ rows.map(e =>
            (StreamingTransitions.micros(e.ts), e.eventId, e.value))
          val (ripe, pending) = all.partition(_._1 < wm * 1000L)
          val out = Seq.newBuilder[EwmaPoint]
          var seq = old.seq
          var ew = old.ewma
          var has = old.hasPrev
          ripe.sortBy(e => (e._1, e._2)).foreach { case (_, id, v) =>
            ew = if (has) alpha * v + (1 - alpha) * ew else v
            has = true
            seq += 1
            out += EwmaPoint(userId, seq,
              id, math.floor(ew * 10000.0 + 0.5) / 10000.0)
          }
          state.update(EwmaState(pending, seq, ew, has))
          if (pending.nonEmpty) state.setTimeoutTimestamp(wm + 1)
          out.result().iterator
      }
  }
}
