package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Sketches

class StreamingSketchSpec extends SparkSpec {

  private val batch1 = Seq(
    "spark shuffle join agg",
    "join join join filter",
    "heavy heavy heavy heavy")
  private val batch2 = Seq(
    "filter scan heavy spark",
    "heavy agg shuffle shuffle")

  private def sketchMap(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("streaming sketch equals the batch sketch after every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val running = StreamingSketch.runningTokenSketch(
      input.toDF().withColumnRenamed("value", "text"), "text", width = 64, depth = 4)
    val query = running.writeStream.format("memory").queryName("cms_running")
      .outputMode(OutputMode.Complete()).start()

    input.addData(batch1: _*)
    query.processAllAvailable()
    val afterB1 = sketchMap(spark.table("cms_running").collect())
    val batchB1 = sketchMap(Sketches.countMinTokenSketch(
      batch1.toDF("text"), "text", 64, 4).collect())
    assert(afterB1 == batchB1, "prefix parity after batch 1")

    input.addData(batch2: _*)
    query.processAllAvailable()
    query.stop()
    val afterB2 = sketchMap(spark.table("cms_running").collect())
    val batchAll = sketchMap(Sketches.countMinTokenSketch(
      (batch1 ++ batch2).toDF("text"), "text", 64, 4).collect())
    assert(afterB2 == batchAll, "full parity after batch 2")
    // the state bound: never more rows than the d×w grid
    assert(afterB2.size <= 64 * 4)
  }
}
