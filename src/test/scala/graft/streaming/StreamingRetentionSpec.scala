package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StreamingRetention.{RetentionEvent, RetentionIncrement}

class StreamingRetentionSpec extends SparkSpec {

  private val Week = 604800000L // ms, same integer week the d31 batch query uses
  private def at(week: Long, hourOfWeek: Int = 12): Timestamp =
    new Timestamp(week * Week + hourOfWeek * 3600000L)

  /** d31's batch semantics: distinct (user, week), cohort = min week,
    * one (cohort, offset) row per active week. */
  private def batchIncrements(events: Seq[RetentionEvent]): Set[RetentionIncrement] =
    events.groupBy(_.userId).flatMap { case (u, evs) =>
      val weeks = evs.map(e => Math.floorDiv(e.ts.getTime, Week)).distinct
      val cohort = weeks.min
      weeks.map(w => RetentionIncrement(u, cohort, w - cohort))
    }.toSet

  private def run(batches: Seq[Seq[RetentionEvent]]): Seq[RetentionIncrement] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RetentionEvent]
    val out = StreamingRetention.increments(
      input.toDS().withWatermark("ts", "3 days").as[RetentionEvent])
    val name = s"retention_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    // two far-future ticks: advance the watermark, then fire the timeouts
    input.addData(RetentionEvent(-1L, at(1000)))
    query.processAllAvailable()
    input.addData(RetentionEvent(-1L, at(1001)))
    query.processAllAvailable()
    query.stop()
    spark.table(name).as[RetentionIncrement].collect().toSeq
      .filter(_.userId >= 0)
  }

  test("increments match the batch retention triangle, exactly once per (user, week)") {
    val events = Seq(
      // user 1: cohort week 0, returns weeks 1 and 3
      RetentionEvent(1L, at(0)), RetentionEvent(1L, at(0, 20)),
      RetentionEvent(1L, at(1)),
      // user 2: week 0 only (delivered in batch 1 — by batch 2 the
      // watermark has passed week 0 and the row would be dropped as late)
      RetentionEvent(2L, at(0, 5)),
      RetentionEvent(1L, at(3)),
      // user 3: first seen week 2 — a different cohort
      RetentionEvent(3L, at(2)), RetentionEvent(3L, at(3, 1)))
    // same weeks repeated across batches must not re-emit
    val got = run(Seq(events.take(4), events.drop(4), Seq(
      RetentionEvent(1L, at(3, 18)), RetentionEvent(3L, at(3, 9)))))
    assert(got.size == got.toSet.size, s"duplicate increments: $got")
    assert(got.toSet == batchIncrements(events))
    // the aggregated triangle equals the batch grid
    val grid = got.groupBy(i => (i.cohortWeek, i.weekOffset)).view.mapValues(_.size).toMap
    assert(grid == Map((0L, 0L) -> 2, (0L, 1L) -> 1, (0L, 3L) -> 1,
      (2L, 0L) -> 1, (2L, 1L) -> 1))
  }

  test("a late earlier-week event inside the horizon lowers the cohort before finalization") {
    // batch 1: user seen in week 1; batch 2 delivers a LATE week-0 event
    // while the watermark still allows it (wm after batch 1 = week1+12h - 3d
    // < week 1 start, so week 0 is still open only if within 3 days — place
    // the late event at the very end of week 0 to stay inside the horizon)
    val b1 = Seq(RetentionEvent(7L, at(1, 12)))
    val late = Seq(RetentionEvent(7L, at(0, 167))) // last hour of week 0
    val got = run(Seq(b1, late))
    assert(got.toSet == Set(
      RetentionIncrement(7L, 0L, 0L), RetentionIncrement(7L, 0L, 1L)),
      s"got $got")
  }

  test("weeks arriving after finalization emit eagerly against the frozen cohort") {
    // finalize user 9's cohort (ticks push the watermark far ahead), then a
    // much later week arrives: it must emit exactly one increment with the
    // original cohort
    val got = run(Seq(
      Seq(RetentionEvent(9L, at(0))),
      Seq(RetentionEvent(-1L, at(500))), // advances wm → finalizes cohort 0
      Seq(RetentionEvent(9L, at(600)))))
    assert(got.toSet == Set(
      RetentionIncrement(9L, 0L, 0L), RetentionIncrement(9L, 0L, 600L)),
      s"got $got")
  }
}
