package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Evaluation

object StreamingCalibrationSpec {
  final case class Scored(s: Double, y: Boolean)
}

/** Batch-vs-stream parity for the x113 reliability diagram: streaming bin
  * statistics + the shared finishing view must equal the batch report
  * over the prefix after EVERY micro-batch, including out-of-unit logits
  * (clamp bins) and late arrivals into already-seen bins. */
class StreamingCalibrationSpec extends SparkSpec {
  import StreamingCalibrationSpec.Scored

  test("streaming bin stats + shared finish view equal batch report after every batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batches = Seq(
      Seq(Scored(0.05, false), Scored(0.08, true), Scored(0.55, true)),
      Seq(Scored(0.52, false), Scored(0.95, true), Scored(1.3, true)),
      // late arrivals into bins 0 and 5, plus a below-zero logit
      Seq(Scored(0.01, false), Scored(0.58, true), Scored(-0.2, false)))

    val input = MemoryStream[Scored]
    val out = StreamingCalibration.binStats(input.toDF(), col("s"), col("y"))
    val name = s"calib_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()

    var prefix = Seq.empty[Scored]
    batches.foreach { b =>
      input.addData(b: _*); query.processAllAvailable()
      prefix = prefix ++ b
      val batch = Evaluation.calibrationReport(
        prefix.toDF("s", "y"), col("s"), col("y"))
        .collect().map(_.toString).sorted.toSeq
      val streamed = Evaluation.finishCalibration(spark.table(name))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch, s"after ${prefix.size} rows")
    }
    query.stop()
  }
}
