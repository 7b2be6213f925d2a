package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Evaluation

object StreamingIpsSpec {
  final case class Log(a: String, r: Double)
}

/** Batch-vs-stream parity for the IPS off-policy audit: the running
  * per-action cells + the shared finish equal the batch report after
  * EVERY micro-batch, including an action that first appears mid-stream
  * (every weight re-derives over the grown action set). */
class StreamingIpsSpec extends SparkSpec {
  import StreamingIpsSpec.Log

  test("running cells + shared finish equal the batch report after every batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batches = Seq(
      Seq(Log("click", 1.0), Log("click", 0.5), Log("view", 0.0)),
      // a third action appears mid-stream: K flips 2 → 3, every weight moves
      Seq(Log("buy", 10.0), Log("view", 0.25), Log("click", -0.5)),
      Seq(Log("buy", 7.5), Log("view", 0.0), Log("view", 1.0)))

    val input = MemoryStream[Log]
    val cells = StreamingIps.cells(input.toDF(), col("a"), col("r"))
    val name = s"ips_${System.nanoTime()}"
    val q = cells.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      var prefix = Seq.empty[Log]
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
        prefix = prefix ++ b
        val batch = Evaluation.ipsOffPolicy(prefix.toDF(), col("a"), col("r"))
          .collect().map(_.toString).toSeq
        val stream = Evaluation.finishIps(spark.table(name))
          .collect().map(_.toString).toSeq
        assert(stream == batch, s"diverged after ${prefix.size} rows")
      }
    } finally q.stop()
  }
}
