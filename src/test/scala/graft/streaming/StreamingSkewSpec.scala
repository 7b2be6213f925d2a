package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Skew

object StreamingSkewSpec {
  final case class FactRow(key: Long)
}

class StreamingSkewSpec extends SparkSpec {
  import StreamingSkewSpec.FactRow

  test("streaming skew report equals the batch report after every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // one hot key (0) plus a long singleton tail, delivered out of order
    // across three micro-batches
    val all = (1 to 900).map(i =>
      FactRow(if (i % 3 == 0) 0L else (i * 7919L) % 400L))
    val batches = all.grouped(300).toSeq

    val input = MemoryStream[FactRow]
    val query = StreamingSkew.runningKeyCounts(input.toDF(), col("key"))
      .writeStream.format("memory").queryName("skew_counts")
      .outputMode(OutputMode.Complete()).start()

    var prefix = Seq.empty[FactRow]
    batches.foreach { b =>
      input.addData(b: _*)
      query.processAllAvailable()
      prefix = prefix ++ b
      val streamed = Skew.finishSkewReport(spark.table("skew_counts"),
        topK = 5, parallelism = 16)
        .collect().map(_.toString).sorted.toSeq
      val batch = Skew.skewReport(prefix.toDF(), col("key"),
        topK = 5, parallelism = 16)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch && streamed.nonEmpty, s"prefix ${prefix.size}")
    }
    query.stop()
  }
}
