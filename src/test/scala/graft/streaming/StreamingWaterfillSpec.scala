package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.MixtureSampling

object StreamingWaterfillSpec {
  final case class Doc(src: String, sz: Long, w: Long)
}

/** Batch-vs-stream parity for the x125 waterfill: streaming per-source
  * sizes + the shared finishing view must equal the batch plan over the
  * prefix after EVERY micro-batch — including a batch that grows one
  * source past its cap (flipping it from uncapped to capped mid-stream)
  * and a brand-new source appearing late. */
class StreamingWaterfillSpec extends SparkSpec {
  import StreamingWaterfillSpec.Doc

  test("streaming sizes + shared finish view equal batch plan after every batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batches = Seq(
      Seq(Doc("a", 40L, 1L), Doc("b", 100L, 2L)),
      // "a" barely grows while "b" doubles — the ratio order can flip
      Seq(Doc("a", 5L, 1L), Doc("b", 120L, 2L)),
      // a new source arrives late with a heavy weight
      Seq(Doc("c", 300L, 6L), Doc("a", 10L, 1L)))

    val input = MemoryStream[Doc]
    val out = StreamingWaterfill.sourceSizes(input.toDF(),
      col("src"), col("sz"), col("w"))
    val name = s"wfill_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()

    var prefix = Seq.empty[Doc]
    batches.foreach { b =>
      input.addData(b: _*); query.processAllAvailable()
      prefix = prefix ++ b
      val batch = MixtureSampling.weightedTokenWaterfill(
        prefix.toDF(), col("src"), col("sz"), col("w"),
        budgetPpm = 600000, weightLcm = 6)
        .collect().map(_.toString).sorted.toSeq
      val streamed = MixtureSampling.finishWaterfill(spark.table(name),
        budgetPpm = 600000, weightLcm = 6)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch, s"after ${prefix.size} rows")
    }
    query.stop()
  }
}
