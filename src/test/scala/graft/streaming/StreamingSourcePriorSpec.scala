package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.QualityRules

object StreamingSourcePriorSpec {
  final case class Doc(source: String, text: String)
}

/** Batch-vs-stream parity for x111's source prior: the streaming
  * sufficient statistics + the shared shrinkStats view must equal the
  * batch sourcePrior over the prefix after EVERY batch, including
  * out-of-order arrivals (a late low-quality doc for an already-seen
  * source). */
class StreamingSourcePriorSpec extends SparkSpec {
  import StreamingSourcePriorSpec.Doc

  test("streaming stats + shared shrinkage view equal batch sourcePrior after every batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val good = "the quick brown fox jumps over the lazy dog and it was a fine day for this"
    val digits = "12345 67890 11111 22222 33333 44444 55555 66666"
    val batches = Seq(
      Seq(Doc("a", good), Doc("a", good + " again and again"), Doc("b", digits)),
      Seq(Doc("c", good), Doc("b", good), Doc("c", "!!! ??? ###")),
      // late arrival for source a, plus a brand-new source
      Seq(Doc("a", digits), Doc("d", good)))

    val input = MemoryStream[Doc]
    val out = StreamingSourcePrior.sourceQualityStats(input.toDF())
    val name = s"sprior_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()

    var prefix = Seq.empty[Doc]
    batches.foreach { b =>
      input.addData(b: _*); query.processAllAvailable()
      prefix = prefix ++ b
      val batch = QualityRules.sourcePrior(prefix.toDF("source", "text"),
        "text", "source")
        .collect().map(_.toString).sorted.toSeq
      val streamed = QualityRules.shrinkStats(spark.table(name))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch, s"after ${prefix.size} docs")
    }
    query.stop()
  }
}
