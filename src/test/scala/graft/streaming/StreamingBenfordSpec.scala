package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.DataQuality

object StreamingBenfordSpec {
  final case class Amount(v: Double)
}

/** Batch-vs-stream parity for the x169 Benford audit: streaming digit
  * counts + the shared finish must equal the batch report over the
  * prefix after EVERY micro-batch — each batch shifts n and so every
  * digit's expected mass. */
class StreamingBenfordSpec extends SparkSpec {
  import StreamingBenfordSpec.Amount

  test("streaming digit counts + shared finish equal batch after every batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batches = Seq(
      Seq(Amount(1.5), Amount(19.0), Amount(240.0)),
      Seq(Amount(0.4), Amount(31.0), Amount(199.9), Amount(940.0)), // <1 dropped
      Seq(Amount(7.2), Amount(88.0), Amount(12345.0)))

    val input = MemoryStream[Amount]
    val out = StreamingBenford.digitCounts(input.toDF(), col("v"))
    val name = s"benford_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      var prefix = Seq.empty[Amount]
      batches.foreach { b =>
        input.addData(b: _*); query.processAllAvailable()
        prefix = prefix ++ b
        val batch = DataQuality.benfordReport(prefix.toDF(), col("v"))
          .collect().map(_.toString).toSeq
        val streamed = DataQuality.finishBenford(spark, spark.table(name))
          .collect().map(_.toString).toSeq
        assert(streamed == batch, s"divergence after ${prefix.size} values")
      }
    } finally query.stop()
  }
}
