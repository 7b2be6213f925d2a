package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Evaluation

object StreamingBrierSpec {
  final case class Scored(s: Double, y: Boolean)
}

/** Batch-vs-stream parity for the x194 Brier decomposition: streaming
  * quantized bin statistics + the shared Murphy finishing view must equal
  * the batch report over the prefix after EVERY micro-batch — exactly,
  * since the state is integer (no fp accumulation order to diverge). */
class StreamingBrierSpec extends SparkSpec {
  import StreamingBrierSpec.Scored

  test("streaming bin stats + shared Murphy view equal batch report after every batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batches = Seq(
      Seq(Scored(0.05, false), Scored(0.08, true), Scored(0.55, true)),
      Seq(Scored(0.52, false), Scored(0.95, true), Scored(1.3, true)),
      // late arrivals into already-seen bins, plus a below-zero logit
      Seq(Scored(0.01, false), Scored(0.58, true), Scored(-0.2, false)))

    val input = MemoryStream[Scored]
    val out = StreamingBrier.binStats(input.toDF(), col("s"), col("y"))
    val name = s"brier_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()

    var prefix = Seq.empty[Scored]
    batches.foreach { b =>
      input.addData(b: _*); query.processAllAvailable()
      prefix = prefix ++ b
      val batch = Evaluation.brierReport(
        prefix.toDF("s", "y"), col("s"), col("y"))
        .collect().map(_.toString).toSeq
      val streamed = Evaluation.finishBrier(spark.table(name))
        .collect().map(_.toString).toSeq
      assert(streamed == batch, s"after ${prefix.size} rows")
    }
    query.stop()
  }
}
