package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Batch/streaming parity for the native session_window aggregation (the
  * d36 twin): the same StreamingSessionWindow.sessions body, fed the same
  * events — batch as one static frame, streaming as OUT-OF-ORDER
  * micro-batches within the watermark horizon — must produce identical
  * session rows. Completes the "every event-family query has both
  * execution modes" line: d29 ewma, d30 funnel, d31 retention, d32
  * actives, d33 transitions, d35 inter-arrival, d36 session_window. */
object StreamingSessionWindowSpec {
  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
}

class StreamingSessionWindowSpec extends SparkSpec {
  import StreamingSessionWindowSpec.Ev

  private def ts(min: Int) = Timestamp.valueOf(
    f"2024-06-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("streaming session_window equals the batch aggregation under out-of-order delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 90 events across 4 users with idle gaps straddling the 30-min session
    // gap; values exercise the 2-decimal rounding
    val all = (1L to 90L).map { i =>
      Ev(i % 4, ts(((i * 29) % 300).toInt), (i % 7) * 0.33)
    }

    val batch = StreamingSessionWindow.sessions(all.toDF(), "30 minutes")
      .collect().map(_.toString).sorted.toSeq

    val input = MemoryStream[Ev]
    val query = StreamingSessionWindow
      .sessions(input.toDF().withWatermark("ts", "2 hours"), "30 minutes")
      .writeStream.format("memory").queryName("sw_sessions")
      .outputMode(OutputMode.Append()).start()

    // three micro-batches, each internally SHUFFLED, and batch 2 delivers
    // rows EARLIER than batch 1's max event time (late but inside the
    // 2-hour watermark horizon) — the merging-window state must stitch
    // them into the same sessions the batch plan computes
    val rnd = new scala.util.Random(11)
    val sorted = all.sortBy(_.ts.getTime)
    val (b1, rest) = sorted.splitAt(40)
    val (b2, b3) = rest.splitAt(30)
    input.addData(rnd.shuffle(b1.drop(5) ++ b2.take(5)): _*)
    query.processAllAvailable()
    input.addData(rnd.shuffle(b2.drop(5) ++ b1.take(5)): _*) // b1's earliest rows arrive LAST
    query.processAllAvailable()
    input.addData(rnd.shuffle(b3): _*)
    query.processAllAvailable()
    // far-future tick pushes the watermark past every session end so all
    // sessions finalize; its own session stays open and is excluded below
    input.addData(Ev(999L, ts(3000), 0.0))
    query.processAllAvailable()
    input.addData(Ev(999L, ts(3001), 0.0))
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table("sw_sessions")
      .where("user_id <> 999")
      .collect().map(_.toString).sorted.toSeq

    assert(streamed == batch,
      s"parity broke:\n batch=${batch.mkString("; ")}\n stream=${streamed.mkString("; ")}")
  }
}
