package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StreamingDedup.DocEvent

class StreamingIntakeSpec extends SparkSpec {

  private def ts(min: Int) = Timestamp.valueOf(f"2024-06-01 10:$min%02d:00")

  test("streaming intake gates quality, drops dups, and agrees with the batch gates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val good = "the quick brown fox jumps over the lazy dog near the river bank today"
    val other = "a completely different document with the usual words and a story about the sea"
    val noise = "@@@ 111 222 $$$ ### 333 %%% +++"

    val input = MemoryStream[DocEvent]
    val cleaned = StreamingIntake.clean(input.toDF(), "text", "ts", minQuality = 0.4)
    val query = cleaned.writeStream.format("memory").queryName("intake")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      DocEvent(1L, good, ts(0)),
      DocEvent(2L, noise, ts(0)),   // quality gate
      DocEvent(3L, good, ts(1)),    // exact dup of 1
      DocEvent(4L, other, ts(1)))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("intake")
    val ids = out.select("docId").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 4L), ids.toString)

    // stream and batch agree on the gates: the same docs pass the batch
    // quality gate with the same kernel
    import org.apache.spark.sql.functions._
    val batchPass = Seq((1L, good), (2L, noise), (4L, other)).toDF("doc_id", "text")
      .where(graft.operators.TextAnalysis.qualityScore(col("text")) >= 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchPass == Set(1L, 4L))

    // token accounting columns ride along for downstream reporting
    assert(out.columns.contains("__n_tokens") && out.columns.contains("__lang"))
    assert(out.where(col("docId") === 1L).head().getAs[Long]("__n_tokens") == 14L)
  }

  test("intake report aggregates docs/tokens per event-time window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[DocEvent]
    val cleaned = StreamingIntake.clean(input.toDF(), "text", "ts", minQuality = 0.1)
    val report = StreamingIntake.intakeReport(cleaned, "ts", window = "5 minutes")
    val query = report.writeStream.format("memory").queryName("intake_report")
      .outputMode(OutputMode.Append()).start()

    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    input.addData(
      DocEvent(1L, base + " one", ts(0)),
      DocEvent(2L, base + " two", ts(2)),
      DocEvent(3L, base + " three", ts(7)))
    query.processAllAvailable()
    // advance the watermark far enough to close both windows
    input.addData(DocEvent(9L, base + " closer", ts(40)))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("intake_report")
      .collect().map(r => r.getTimestamp(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(ts(0)) == ((2L, 28L)), rows.toString)   // two 14-token docs
    assert(rows(ts(5)) == ((1L, 14L)), rows.toString)
  }
}
