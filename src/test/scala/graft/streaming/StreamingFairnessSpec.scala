package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Evaluation

object StreamingFairnessSpec {
  final case class Obs(g: String, p: Boolean, y: Boolean)
}

/** Batch-vs-stream parity for the fairness audit: the running confusion
  * cells + the shared finish equal the batch audit over the prefix after
  * EVERY micro-batch, including a group that first appears mid-stream
  * (the gap columns must re-derive over the grown group set). */
class StreamingFairnessSpec extends SparkSpec {
  import StreamingFairnessSpec.Obs

  test("running cells + shared finish equal the batch audit after every batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batches = Seq(
      Seq(Obs("a", true, true), Obs("a", false, false), Obs("b", true, false)),
      // group c appears mid-stream; b gains its first positive
      Seq(Obs("c", true, true), Obs("b", true, true), Obs("a", true, true)),
      Seq(Obs("c", false, true), Obs("b", false, false), Obs("a", false, true)))

    val input = MemoryStream[Obs]
    val cells = StreamingFairness.cells(
      input.toDF(), col("g"), col("p"), col("y"))
    val name = s"fair_${System.nanoTime()}"
    val q = cells.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      var prefix = Seq.empty[Obs]
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
        prefix = prefix ++ b
        val batch = Evaluation.fairnessAudit(
          prefix.toDF(), col("g"), col("p"), col("y"))
          .collect().map(_.toString).toSeq
        val stream = Evaluation.finishFairness(spark.table(name))
          .collect().map(_.toString).toSeq
        assert(stream == batch, s"diverged after ${prefix.size} rows")
      }
    } finally q.stop()
  }
}
