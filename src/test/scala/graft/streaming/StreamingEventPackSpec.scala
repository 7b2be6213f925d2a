package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StreamingEwma.{EwmaEvent, EwmaPoint}
import graft.streaming.StreamingTransitions.{Transition, TransitionEvent}

/** Batch-vs-stream parity for the event-pack: d33 (Markov transitions) and
  * d29 (EWMA) streaming twins on out-of-order, multi-batch delivery. */
class StreamingEventPackSpec extends SparkSpec {

  private val base = Timestamp.valueOf("2024-06-01 00:00:00").getTime
  private def ts(min: Int) = new Timestamp(base + min * 60000L)

  // ---------- transitions ----------

  /** d33's batch semantics: per user sort by (ts, event_id), consecutive
    * pairs. */
  private def batchTransitions(evs: Seq[TransitionEvent]): Map[(String, String), Int] =
    evs.groupBy(_.userId).toSeq.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (StreamingTransitions.micros(e.ts), e.eventId))
      ordered.zip(ordered.drop(1)).map(p => (p._1.eventType, p._2.eventType))
    }.groupBy(identity).view.mapValues(_.size).toMap

  private def runTransitions(batches: Seq[Seq[TransitionEvent]]): Seq[Transition] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[TransitionEvent]
    val out = StreamingTransitions.transitions(
      input.toDS().withWatermark("ts", "30 minutes").as[TransitionEvent])
    val name = s"trans_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    input.addData(TransitionEvent(-1L, -1L, "tick", ts(100000)))
    query.processAllAvailable()
    input.addData(TransitionEvent(-1L, -2L, "tick", ts(100001)))
    query.processAllAvailable()
    query.stop()
    spark.table(name).as[Transition].collect().toSeq.filter(_.userId >= 0)
  }

  test("transitions: out-of-order multi-batch delivery matches the batch lead() chain") {
    val events = Seq(
      TransitionEvent(1L, 1L, "view", ts(0)),
      TransitionEvent(1L, 2L, "click", ts(10)),
      TransitionEvent(1L, 3L, "purchase", ts(20)),
      TransitionEvent(1L, 4L, "view", ts(35)),
      TransitionEvent(2L, 5L, "view", ts(5)),
      TransitionEvent(2L, 6L, "error", ts(6)),
      // same-timestamp pair: event_id must break the tie
      TransitionEvent(3L, 8L, "b", ts(7)), TransitionEvent(3L, 7L, "a", ts(7)))
    // batch 2 delivers user 1's click LATE (inside the 30-min horizon) —
    // the sealed ordering must still place it between view and purchase
    val batches = Seq(
      Seq(events(0), events(2), events(4), events(5), events(6), events(7)),
      Seq(events(1), events(3)))
    val got = runTransitions(batches)
      .groupBy(t => (t.fromType, t.toType)).view.mapValues(_.size).toMap
    assert(got == batchTransitions(events), s"got $got")
    // the tie-broken chain for user 3 is a→b, never b→a
    assert(got.get(("a", "b")).contains(1) && !got.contains(("b", "a")))
  }

  test("transitions: an anchor bridges across a long idle gap like batch lead()") {
    val evs = Seq(
      TransitionEvent(5L, 1L, "view", ts(0)),
      TransitionEvent(5L, 2L, "click", ts(3000))) // 50 h later, separate batch
    val got = runTransitions(Seq(Seq(evs(0)), Seq(evs(1))))
    assert(got.groupBy(t => (t.fromType, t.toType)).view.mapValues(_.size).toMap ==
      batchTransitions(evs))
  }

  test("inter-arrival gaps: the streaming leg reproduces d35's per-pair gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      TransitionEvent(1L, 1L, "view", ts(0)),
      TransitionEvent(1L, 2L, "click", ts(10)),
      TransitionEvent(1L, 3L, "purchase", ts(25)),
      TransitionEvent(2L, 4L, "view", ts(5)),
      TransitionEvent(2L, 5L, "view", ts(6)))
    val input = MemoryStream[TransitionEvent]
    val out = StreamingTransitions.interArrivalGaps(
      input.toDS().withWatermark("ts", "30 minutes").as[TransitionEvent])
    val name = s"gaps_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    // out-of-order: the middle event arrives second
    input.addData(events(0), events(2), events(3)); query.processAllAvailable()
    input.addData(events(1), events(4)); query.processAllAvailable()
    input.addData(TransitionEvent(-1L, -1L, "tick", ts(100000))); query.processAllAvailable()
    input.addData(TransitionEvent(-1L, -2L, "tick", ts(100001))); query.processAllAvailable()
    query.stop()
    val got = spark.table(name).as[StreamingTransitions.EventGap].collect().toSeq
      .filter(_.userId >= 0).sortBy(g => (g.userId, g.gapUs))
    // d35's reference: sort per user by (ts, id), gap tagged by later event
    val exp = events.groupBy(_.userId).toSeq.flatMap { case (u, es) =>
      val o = es.sortBy(e => (StreamingTransitions.micros(e.ts), e.eventId))
      o.zip(o.drop(1)).map(p => StreamingTransitions.EventGap(u, p._2.eventType,
        StreamingTransitions.micros(p._2.ts) - StreamingTransitions.micros(p._1.ts)))
    }.sortBy(g => (g.userId, g.gapUs))
    assert(got == exp, s"got $got expected $exp")
  }

  // ---------- ewma ----------

  /** d29's batch semantics: ordered fold of 0.25·x + 0.75·prev. */
  private def batchEwma(evs: Seq[EwmaEvent], alpha: Double): Seq[EwmaPoint] =
    evs.groupBy(_.userId).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (StreamingTransitions.micros(e.ts), e.eventId))
      ordered.zipWithIndex.scanLeft(Option.empty[EwmaPoint]) {
        case (prev, (e, i)) =>
          val ew = prev match {
            case None => e.value
            case Some(p0) => alpha * e.value + (1 - alpha) * p0.ewma
          }
          Some(EwmaPoint(u, i + 1L, e.eventId, ew))
      }.flatten.map(p =>
        p.copy(ewma = math.floor(p.ewma * 10000.0 + 0.5) / 10000.0))
    }

  test("ewma: sealed ordered fold matches the batch recursion, late rows included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      EwmaEvent(1L, 1L, 10.0, ts(0)), EwmaEvent(1L, 2L, 20.0, ts(10)),
      EwmaEvent(1L, 3L, 2.5, ts(20)), EwmaEvent(1L, 4L, 40.0, ts(25)),
      EwmaEvent(2L, 5L, 7.0, ts(1)))
    val input = MemoryStream[EwmaEvent]
    val out = StreamingEwma.points(
      input.toDS().withWatermark("ts", "30 minutes").as[EwmaEvent])
    val name = s"ewma_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    // deliver out of order: the ts(10) point arrives in batch 2
    input.addData(events(0), events(2), events(4)); query.processAllAvailable()
    input.addData(events(1), events(3)); query.processAllAvailable()
    input.addData(EwmaEvent(-1L, -1L, 0.0, ts(100000))); query.processAllAvailable()
    input.addData(EwmaEvent(-1L, -2L, 0.0, ts(100001))); query.processAllAvailable()
    query.stop()
    val got = spark.table(name).as[EwmaPoint].collect().toSeq
      .filter(_.userId >= 0).sortBy(p => (p.userId, p.seq))
    val exp = batchEwma(events, 0.25).sortBy(p => (p.userId, p.seq))
    assert(got == exp, s"got $got expected $exp")
    // the d29 fold: 10 → .25·20+.75·10=12.5 → .25·2.5+.75·12.5=10 → 17.5
    assert(got.filter(_.userId == 1L).map(_.ewma) == Seq(10.0, 12.5, 10.0, 17.5))
  }
}
