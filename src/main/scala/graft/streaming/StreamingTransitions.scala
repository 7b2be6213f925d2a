package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming Markov transition extraction — the continuous form of the d33
  * query: per user, consecutive event pairs in exact (ts, event_id) order
  * yield (from_type, to_type) transitions; counting them downstream gives
  * the transition matrix.
  *
  * Exactness under out-of-order delivery uses watermark SEALING: an event
  * is sealed once its timestamp is strictly below the watermark — Spark
  * drops any later arrival below the watermark, so nothing can ever sort
  * before a sealed event. Each invocation seals the prefix, sorts it by
  * (µs timestamp, event_id) — the batch query's exact total order — emits
  * the transitions of the sealed chain (bridging from the previously
  * sealed anchor), and buffers the unsealed suffix. An event-time timeout
  * at watermark+1 keeps sealing even when the user goes quiet.
  *
  * State per user: the unsealed suffix (bounded by the lateness horizon —
  * events older than the watermark are gone) plus ONE anchor event. The
  * anchor persists for the stream's lifetime by design: a transition can
  * bridge an arbitrarily long idle gap, exactly as the batch lead() does.
  */
object StreamingTransitions {

  final case class TransitionEvent(
      userId: Long, eventId: Long, eventType: String, ts: Timestamp)

  /** (µs, eventId, type) triples; `last` is the sealed anchor. Public: the
    * state encoder's generated code must reach the constructor. */
  final case class ChainState(
      buffer: Seq[(Long, Long, String)], last: Option[(Long, Long, String)])

  final case class Transition(userId: Long, fromType: String, toType: String)

  /** µs event time — Timestamp.getTime is ms-truncated; the nanos field
    * restores the fractional second so ordering matches unix_micros(ts). */
  private[streaming] def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  final case class EventGap(userId: Long, eventType: String, gapUs: Long)

  /** Sealed-replay core shared by every consecutive-pair operator: each
    * invocation seals the strictly-below-watermark prefix, sorts it into
    * the exact (µs, event_id) order, bridges from the persistent anchor,
    * and emits `f` over consecutive pairs — each pair exactly once. */
  private def pairStream[O: org.apache.spark.sql.Encoder](
      events: Dataset[TransitionEvent])(
      f: (Long, (Long, Long, String), (Long, Long, String)) => O): Dataset[O] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[ChainState, O](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          val old = state.getOption.getOrElse(ChainState(Nil, None))
          val all = old.buffer ++
            rows.map(e => (micros(e.ts), e.eventId, e.eventType))
          // seal strictly below the watermark: any future arrival has
          // event-time >= wm, so it can never sort before a sealed event
          val (ripe, pending) = all.partition(_._1 < wm * 1000L)
          val chain = old.last.toSeq ++ ripe.sortBy(e => (e._1, e._2))
          state.update(ChainState(pending, chain.lastOption.orElse(old.last)))
          if (pending.nonEmpty) state.setTimeoutTimestamp(wm + 1)
          chain.iterator.sliding(2).withPartial(false)
            .map(p => f(userId, p(0), p(1)))
      }
  }

  /** Transitions over a stream of typed events. Input must already carry a
    * watermark on `ts`. */
  def transitions(events: Dataset[TransitionEvent]): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    pairStream(events)((u, a, b) => Transition(u, a._3, b._3))
  }

  /** Inter-arrival gaps — the streaming leg of the d35 cadence report:
    * one row per consecutive event pair with the gap in µs, tagged with
    * the LATER event's type (d35's convention). Aggregate downstream per
    * type for the continuous cadence dashboard. */
  def interArrivalGaps(events: Dataset[TransitionEvent]): Dataset[EventGap] = {
    val spark = events.sparkSession
    import spark.implicits._
    pairStream(events)((u, a, b) => EventGap(u, b._3, b._1 - a._1))
  }
}
