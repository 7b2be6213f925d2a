package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.CorpusStats

object StreamingGiniSpec {
  final case class Doc(source: String, n_chars: Long)
}

/** Batch-vs-stream parity for the x166 concentration report: streaming
  * per-source masses + the shared finish view must equal the batch
  * report over the prefix after EVERY micro-batch — a newly-appearing
  * source changes n and re-ranks every mass. */
class StreamingGiniSpec extends SparkSpec {
  import StreamingGiniSpec.Doc

  test("streaming masses + shared finish equal the batch report after every batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batches = Seq(
      Seq(Doc("a", 100), Doc("b", 50)),
      Seq(Doc("a", 25), Doc("c", 400)), // new source re-ranks everything
      Seq(Doc("b", 425))) // ties a and b+… exactly

    val input = MemoryStream[Doc]
    val out = StreamingGini.sourceMasses(input.toDF(), col("source"), col("n_chars"))
    val name = s"gini_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      var prefix = Seq.empty[Doc]
      batches.foreach { b =>
        input.addData(b: _*); query.processAllAvailable()
        prefix = prefix ++ b
        val batch = CorpusStats.sourceConcentration(
          prefix.toDF(), col("source"), col("n_chars"))
          .collect().map(_.toString).toSeq
        val streamed = CorpusStats.finishConcentration(spark.table(name))
          .collect().map(_.toString).toSeq
        assert(streamed == batch, s"divergence after ${prefix.size} docs")
      }
    } finally query.stop()
  }
}
