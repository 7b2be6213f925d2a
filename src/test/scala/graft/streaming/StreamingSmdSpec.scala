package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Evaluation

object StreamingSmdSpec {
  final case class Obs(t: Boolean, x: Double, y: Double)
}

/** Batch-vs-stream parity for the SMD balance audit: the running moment
  * cells + the shared finish equal the batch table over the prefix after
  * EVERY micro-batch, including the batch where one arm first gains
  * rows (NULL smd → defined smd). */
class StreamingSmdSpec extends SparkSpec {
  import StreamingSmdSpec.Obs

  test("running cells + shared finish equal the batch audit after every batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batches = Seq(
      Seq(Obs(false, 0.0, 5.0), Obs(false, 2.0, 7.0)), // control only: smd NULL
      Seq(Obs(true, 2.0, 5.0), Obs(true, 4.0, 7.0)),   // treated arrives
      Seq(Obs(false, 1.0, 6.0), Obs(true, 3.0, 6.0)))

    val covs = Seq("x" -> col("x"), "y" -> col("y"))
    val input = MemoryStream[Obs]
    val cells = StreamingSmd.cells(input.toDF(), col("t"), covs)
    val name = s"smd_${System.nanoTime()}"
    val q = cells.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      var prefix = Seq.empty[Obs]
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
        prefix = prefix ++ b
        val batch = Evaluation.smdBalance(prefix.toDF(), col("t"), covs)
          .collect().map(_.toString).toSeq
        val stream = Evaluation.finishSmd(spark.table(name))
          .collect().map(_.toString).toSeq
        assert(stream == batch, s"diverged after ${prefix.size} rows")
      }
    } finally q.stop()
  }
}
