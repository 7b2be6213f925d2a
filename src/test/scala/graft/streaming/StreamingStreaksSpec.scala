package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StreamingStreaks.{DayEvent, StreakSummary}

/** Batch-vs-stream parity for the d37 gaps-and-islands streak query. */
class StreamingStreaksSpec extends SparkSpec {

  private def ts(day: Int, hour: Int = 12) =
    Timestamp.valueOf(f"2024-06-${day}%02d $hour%02d:00:00")

  /** d37's batch semantics over a prefix, computed independently. */
  private def batchStreaks(evs: Seq[DayEvent]): Map[Long, (Long, Long, Long)] =
    evs.groupBy(_.userId).map { case (u, es) =>
      val days = es.map(e => Math.floorDiv(e.ts.getTime, 86400000L)).distinct.sorted
      val runs = days.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: tail, d) if d == e + 1 => (s, d) :: tail
        case (acc, d) => (d, d) :: acc
      }
      u -> (runs.map(r => r._2 - r._1 + 1).max,
        runs.size.toLong, days.size.toLong)
    }

  test("streaming streaks match batch after every micro-batch, including a run merge") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // user 1: days 1,2 then 4,5 (two runs) then day 3 arrives LATE and
    // merges them into one 5-day run; user 2: single days far apart
    val batches = Seq(
      Seq(DayEvent(1L, ts(1)), DayEvent(1L, ts(2)), DayEvent(2L, ts(1))),
      Seq(DayEvent(1L, ts(4)), DayEvent(1L, ts(5)), DayEvent(2L, ts(8))),
      Seq(DayEvent(1L, ts(3)), DayEvent(2L, ts(9))))

    val input = MemoryStream[DayEvent]
    val out = StreamingStreaks.summaries(
      input.toDS().withWatermark("ts", "10 days").as[DayEvent])
    val name = s"streaks_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()

    var prefix = Seq.empty[DayEvent]
    batches.foreach { b =>
      input.addData(b: _*); query.processAllAvailable()
      prefix = prefix ++ b
      val latest = spark.table(name).as[StreakSummary].collect()
        .groupBy(_.userId).map { case (u, rows) =>
          val r = rows.maxBy(_.updateSeq)
          u -> (r.longestStreak, r.nStreaks, r.nActiveDays)
        }
      assert(latest == batchStreaks(prefix), s"after ${prefix.size} events")
    }
    // the merge really happened: one 5-day streak for user 1
    assert(batchStreaks(prefix)(1L) == (5L, 1L, 5L))
    query.stop()
  }

  test("state compacts: intervals beyond the lateness horizon freeze into scalars") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // tight 1-day watermark; a month of alternating days, then verify the
    // summary still counts every frozen run correctly
    val evs = (1 to 29 by 2).map(d => DayEvent(7L, ts(d)))
    val input = MemoryStream[DayEvent]
    val out = StreamingStreaks.summaries(
      input.toDS().withWatermark("ts", "1 day").as[DayEvent])
    val name = s"streaks_frozen_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update()).start()
    evs.grouped(5).foreach { b => input.addData(b: _*); query.processAllAvailable() }
    val r = spark.table(name).as[StreakSummary].collect().maxBy(_.updateSeq)
    assert((r.longestStreak, r.nStreaks, r.nActiveDays) == (1L, 15L, 15L))
    query.stop()
  }

  test("mergeDays: gap-fill joins runs; adjacency and containment handled") {
    import StreamingStreaks.mergeDays
    assert(mergeDays(Seq((1L, 2L), (4L, 5L)), Seq(3L)) == Seq((1L, 5L)))
    assert(mergeDays(Nil, Seq(7L, 9L, 8L)) == Seq((7L, 9L)))
    assert(mergeDays(Seq((1L, 3L)), Seq(2L)) == Seq((1L, 3L)))
    assert(mergeDays(Seq((1L, 1L)), Seq(3L)) == Seq((1L, 1L), (3L, 3L)))
    assert(mergeDays(Nil, Nil) == Nil)
  }
}
