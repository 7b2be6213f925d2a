package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Evaluation

object StreamingDriftSpec {
  final case class Binned(bin: String, p: Boolean)
}

/** Batch-vs-stream parity for the x123 drift monitor: streaming bin
  * counts + the shared finishing view must equal the batch report over
  * the prefix after EVERY micro-batch — including a bin that exists in
  * only one cohort and late arrivals into already-seen bins. */
class StreamingDriftSpec extends SparkSpec {
  import StreamingDriftSpec.Binned

  test("streaming bin counts + shared finish view equal batch report after every batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batches = Seq(
      Seq(Binned("u", true), Binned("u", false), Binned("v", true)),
      // v never arrives in cohort B — the disappearing-category alarm
      Seq(Binned("w", false), Binned("u", true), Binned("v", true)),
      // late arrivals into u and w
      Seq(Binned("u", false), Binned("w", true), Binned("w", false)))

    val input = MemoryStream[Binned]
    val out = StreamingDrift.binCounts(input.toDF(), col("bin"), col("p"))
    val name = s"drift_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()

    var prefix = Seq.empty[Binned]
    batches.foreach { b =>
      input.addData(b: _*); query.processAllAvailable()
      prefix = prefix ++ b
      val batch = Evaluation.driftReport(
        prefix.toDF("bin", "p"), col("bin"), col("p"))
        .collect().map(_.toString).sorted.toSeq
      val streamed = Evaluation.finishDrift(spark.table(name))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch, s"after ${prefix.size} rows")
    }
    query.stop()
  }
}
