package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.CheckStream.{ChangeEvent, CheckEvent}

class CheckStreamSpec extends SparkSpec {

  private def ts(min: Int) = Timestamp.valueOf(f"2024-06-01 10:$min%02d:00")

  test("detectChanges emits first-check then only real transitions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CheckEvent]
    val query = CheckStream.detectChanges(input.toDS())
      .writeStream.format("memory").queryName("changes")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      CheckEvent("r1", "a.fr", ts(0), Some(200), timeout = false, Some("10"), Some("text/csv")),
      CheckEvent("r1", "a.fr", ts(1), Some(200), timeout = false, Some("10"), Some("text/csv")),
      CheckEvent("r1", "a.fr", ts(2), Some(404), timeout = false, Some("10"), Some("text/csv")),
      CheckEvent("r2", "b.fr", ts(0), Some(200), timeout = false, Some("5"), Some("text/csv")))
    query.processAllAvailable()
    input.addData(
      CheckEvent("r2", "b.fr", ts(3), Some(200), timeout = false, Some("99"), Some("text/csv")))
    query.processAllAvailable()

    val out = spark.table("changes").as[ChangeEvent].collect()
      .map(c => (c.resourceId, c.reason)).toSet
    query.stop()
    assert(out == Set(
      ("r1", "first-check"), ("r1", "no-longer-available"), // 200 → 404 is an availability loss first

      ("r2", "first-check"), ("r2", "content-changed")))
  }

  test("foreachBatch sink appends micro-batches to the date-partitioned store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("stream").toString
    val store = new graft.store.MetaStore(spark, s"$root/meta")
    val input = MemoryStream[CheckEvent]
    val query = CheckStream.sinkToStore(input.toDS(), store, s"$root/ckpt")
    input.addData(
      CheckEvent("r1", "a.fr", ts(0), Some(200), timeout = false, None, None),
      CheckEvent("r2", "b.fr", ts(1), Some(404), timeout = false, None, None))
    query.processAllAvailable()
    input.addData(
      CheckEvent("r1", "a.fr", ts(5), Some(200), timeout = false, None, None))
    query.processAllAvailable()
    query.stop()
    val out = store.load("checks_stream").get
    assert(out.count() == 3)
    assert(out.columns.contains("created_date"))
    assert(out.where($"resourceId" === "r1").count() == 2)
  }

  test("windowed domain counts aggregate with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CheckEvent]
    val counts = CheckStream.domainRequestCounts(
      input.toDS().toDF(), windowLength = "10 minutes", slide = "10 minutes",
      watermark = "0 seconds")
    val query = counts.writeStream.format("memory").queryName("counts")
      .outputMode(OutputMode.Complete()).start()
    input.addData(
      CheckEvent("r1", "a.fr", ts(0), Some(200), timeout = false, None, None),
      CheckEvent("r2", "a.fr", ts(1), Some(200), timeout = false, None, None),
      CheckEvent("r3", "b.fr", ts(2), Some(200), timeout = false, None, None))
    query.processAllAvailable()
    val rows = spark.table("counts").collect()
      .map(r => r.getAs[String]("domain") -> r.getAs[Long]("n_req")).toMap
    query.stop()
    assert(rows == Map("a.fr" -> 2L, "b.fr" -> 1L))
  }
}
