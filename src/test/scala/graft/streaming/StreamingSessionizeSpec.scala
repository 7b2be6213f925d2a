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
