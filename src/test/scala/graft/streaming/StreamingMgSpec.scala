package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Sketches

object StreamingMgSpec {
  final case class TermRow(grp: String, term: String)
}

class StreamingMgSpec extends SparkSpec {
  import StreamingMgSpec.TermRow

  test("streaming MG heavy hitters equal the batch summary after every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // exact regime: 20 distinct terms ≪ capacity 64, skewed counts,
    // delivered out of order across three micro-batches
    val all = (1 to 1500).map(i => TermRow(s"g${i % 2}", s"t${(i * i) % 20}"))
    val batches = all.grouped(500).toSeq

    val input = MemoryStream[TermRow]
    val query = StreamingMg
      .runningHeavyHitters(input.toDF(), col("term"), "grp",
        capacity = 64, topK = 20)
      .writeStream.format("memory").queryName("mg_running")
      .outputMode(OutputMode.Complete()).start()

    var prefix = Seq.empty[TermRow]
    batches.foreach { b =>
      input.addData(b: _*)
      query.processAllAvailable()
      prefix = prefix ++ b
      val streamed = spark.table("mg_running")
        .collect().map(_.toString).sorted.toSeq
      val batch = Sketches.mgHeavyHitters(prefix.toDF(), col("term"), "grp",
        capacity = 64, topK = 20)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch, s"prefix ${prefix.size}")
    }
    query.stop()
  }
}
