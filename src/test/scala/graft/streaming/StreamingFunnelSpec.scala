package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StreamingFunnel.{FunnelEvent, FunnelOutcome}

class StreamingFunnelSpec extends SparkSpec {

  private def ts(min: Int) = Timestamp.valueOf(f"2024-06-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
  private val Minute = 60000L

  /** The d30 batch semantics as a pure fold — the parity reference. */
  private def batchResolve(
      events: Seq[FunnelEvent], deadlineMs: Long): Map[Long, FunnelOutcome] =
    events.groupBy(_.userId).map { case (u, evs) =>
      def times(t: String) = evs.filter(_.eventType == t).map(_.ts.getTime)
      val v = times("view").minOption
      val c = v.flatMap(vt =>
        times("click").filter(t => t > vt && t <= vt + deadlineMs).minOption)
      val p = c.flatMap(ct =>
        times("purchase").filter(t => t > ct && t <= ct + deadlineMs).minOption)
      u -> FunnelOutcome(u, v.getOrElse(-1L), c.getOrElse(-1L), p.getOrElse(-1L))
    }

  private def run(
      batches: Seq[Seq[FunnelEvent]],
      deadlineMs: Long,
      horizon: String = "10 minutes"): Seq[FunnelOutcome] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val out = StreamingFunnel.outcomes(
      input.toDS().withWatermark("ts", horizon).as[FunnelEvent],
      deadlineMs = deadlineMs, idleMs = 2 * deadlineMs)
    val name = s"funnel_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
    // two far-future ticks: advance the watermark, then fire the timeouts
    input.addData(FunnelEvent(-1L, -1L, "tick", ts(100000)))
    query.processAllAvailable()
    input.addData(FunnelEvent(-1L, -2L, "tick", ts(100001)))
    query.processAllAvailable()
    query.stop()
    spark.table(name).as[FunnelOutcome].collect().toSeq
      .filter(_.userId >= 0).sortBy(_.userId)
  }

  test("ordering and deadlines: click-before-view and late-click users do not convert") {
    val d = 30 * Minute
    val events = Seq(
      // user 1: full conversion inside deadlines
      FunnelEvent(1L, 1L, "view", ts(0)), FunnelEvent(1L, 2L, "click", ts(10)),
      FunnelEvent(1L, 3L, "purchase", ts(20)),
      // user 2: click BEFORE the first view only → no click stage
      FunnelEvent(2L, 4L, "click", ts(0)), FunnelEvent(2L, 5L, "view", ts(10)),
      // user 3: click after the 30-min deadline → no click stage
      FunnelEvent(3L, 6L, "view", ts(0)), FunnelEvent(3L, 7L, "click", ts(45)),
      // user 4: purchase before the click → view+click only
      FunnelEvent(4L, 8L, "purchase", ts(5)), FunnelEvent(4L, 9L, "view", ts(10)),
      FunnelEvent(4L, 10L, "click", ts(15)))
    val got = run(Seq(events), d)
    val exp = batchResolve(events, d)
    assert(got.map(o => o.userId -> o).toMap === exp)
    assert(exp(1L).pMs === ts(20).getTime)
    assert(exp(2L).cMs === -1L)
    assert(exp(3L).cMs === -1L)
    assert(exp(4L).cMs === ts(15).getTime && exp(4L).pMs === -1L)
  }

  test("a late view lowers the first-view time and re-qualifies an earlier click") {
    val d = 30 * Minute
    // batch 1: view at t20, click at t10 (does not qualify: before the view)
    // batch 2: LATE view at t5 — inside the 30-min watermark horizon
    // (wm after batch 1 is t20-30 < t5), so it arrives and lowers v,
    // re-qualifying the t10 click
    val b1 = Seq(FunnelEvent(1L, 1L, "view", ts(20)), FunnelEvent(1L, 2L, "click", ts(10)))
    val b2 = Seq(FunnelEvent(1L, 3L, "view", ts(5)))
    val got = run(Seq(b1, b2), d, horizon = "30 minutes")
    assert(got === Seq(FunnelOutcome(1L, ts(5).getTime, ts(10).getTime, -1L)))
  }

  test("streaming outcomes equal the batch fold on a pseudo-random event set") {
    val d = 25 * Minute
    val types = Array("view", "click", "purchase", "other")
    val all = (1L to 240L).map { i =>
      FunnelEvent(i % 12, i, types(((i * 7) % 4).toInt), ts(((i * 13) % 300).toInt))
    }
    // deliver in event-time order across 4 batches (all within the horizon)
    val sorted = all.sortBy(_.ts.getTime)
    val batches = sorted.grouped(60).toSeq
    val got = run(batches, d)
    val exp = batchResolve(all, d).values.toSeq.sortBy(_.userId)
    assert(got === exp)
  }
}
