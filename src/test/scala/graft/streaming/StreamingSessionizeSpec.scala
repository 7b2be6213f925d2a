package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StreamingSessionize.{ClosedSession, Event}

class StreamingSessionizeSpec extends SparkSpec {

  private def ts(min: Int) = Timestamp.valueOf(f"2024-06-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("sessions close on gap and on watermark timeout; counts and bounds exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = StreamingSessionize.sessions(
      input.toDS().withWatermark("ts", "10 minutes").as[Event], gapMs = 10 * 60000L)
    val query = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    // user 1: two events 5 min apart (one session), then a 30-min gap, then one more
    input.addData(Event(1L, 1L, ts(0)), Event(1L, 2L, ts(5)))
    query.processAllAvailable()
    input.addData(Event(1L, 3L, ts(35)), Event(2L, 4L, ts(35)))
    query.processAllAvailable()
    // the first session [0,5] closed when event 3 arrived in-state
    val afterGap = spark.table("sessions").as[ClosedSession].collect()
    assert(afterGap.toSeq == Seq(ClosedSession(1L, ts(0).getTime, ts(5).getTime, 2L)),
      afterGap.mkString(","))

    // advance the watermark far past both open sessions → both flush on timeout
    input.addData(Event(3L, 5L, ts(120)))
    query.processAllAvailable()
    input.addData(Event(3L, 6L, ts(121))) // one more batch so timeouts fire
    query.processAllAvailable()
    query.stop()

    val all = spark.table("sessions").as[ClosedSession].collect()
      .sortBy(s => (s.userId, s.startMs)).toSeq
    assert(all.take(3) == Seq(
      ClosedSession(1L, ts(0).getTime, ts(5).getTime, 2L),
      ClosedSession(1L, ts(35).getTime, ts(35).getTime, 1L),
      ClosedSession(2L, ts(35).getTime, ts(35).getTime, 1L)), all.mkString(","))
  }

  test("streaming sessions equal batch sessionSummary on the same event set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // deterministic pseudo-random event set across 5 users, delivered in
    // three in-order micro-batches, then a far-future flush tick
    val all = (1L to 120L).map { i =>
      StreamingSessionize.Event(i % 5, i, ts(((i * 37) % 240).toInt))
    }.sortBy(e => e.ts.getTime)
    val input = MemoryStream[StreamingSessionize.Event]
    val sessions = StreamingSessionize.sessions(
      input.toDS().withWatermark("ts", "10 minutes")
        .as[StreamingSessionize.Event], gapMs = 15 * 60000L)
    val query = sessions.writeStream.format("memory").queryName("sessions_parity")
      .outputMode(OutputMode.Append()).start()
    all.grouped(40).foreach { batch =>
      input.addData(batch: _*); query.processAllAvailable()
    }
    input.addData(StreamingSessionize.Event(99L, 999L, ts(2000)))
    query.processAllAvailable()
    input.addData(StreamingSessionize.Event(99L, 1000L, ts(2001)))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("sessions_parity")
      .as[StreamingSessionize.ClosedSession].collect()
      .filter(_.userId != 99L)
      .map(s => (s.userId, s.startMs, s.endMs, s.nEvents)).toSet

    val batch = graft.operators.Sessionize.sessionSummary(
      all.map(e => (e.userId, e.eventId, e.ts)).toDF("user_id", "event_id", "ts"),
      "user_id", "ts", "event_id", gapMicros = 15L * 60 * 1000000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3) / 1000, r.getLong(4) / 1000, r.getLong(2)))
      .toSet
    assert(streamed == batch,
      s"streaming-only: ${streamed -- batch}; batch-only: ${batch -- streamed}")
  }

  test("out-of-order rows within a micro-batch sessionize in event order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = StreamingSessionize.sessions(
      input.toDS().withWatermark("ts", "1 hour").as[Event], gapMs = 10 * 60000L)
    val query = sessions.writeStream.format("memory").queryName("sessions_ooo")
      .outputMode(OutputMode.Append()).start()

    // delivered shuffled: event order is 0, 5, 30 → two sessions
    input.addData(Event(1L, 3L, ts(30)), Event(1L, 1L, ts(0)), Event(1L, 2L, ts(5)))
    query.processAllAvailable()
    query.stop()

    val closed = spark.table("sessions_ooo").as[ClosedSession].collect().toSeq
    assert(closed == Seq(ClosedSession(1L, ts(0).getTime, ts(5).getTime, 2L)),
      closed.mkString(","))
  }
}
