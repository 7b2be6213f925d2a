package graft.streaming

import java.sql.Date

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Evaluation

object StreamingMsprtSpec {
  final case class Obs(day: Date, uid: Long, v: Double)
}

/** Batch-vs-stream parity for the mSPRT monitor: the running per-look
  * arm stats + the shared finish equal the batch monitor over the prefix
  * after EVERY micro-batch, including out-of-order days (a late batch
  * back-fills day 1 after day 3 has reported) — the always-valid
  * decision sequence must be identical either way. */
class StreamingMsprtSpec extends SparkSpec {
  import StreamingMsprtSpec.Obs

  private def d(day: Int): Date = Date.valueOf(f"2024-01-$day%02d")

  test("running look stats + shared finish equal the batch monitor " +
    "after every batch, out-of-order days included") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batches = Seq(
      Seq(Obs(d(1), 0, 10.0), Obs(d(1), 1, 4.0), Obs(d(1), 2, 11.5),
        Obs(d(1), 3, 4.5)),
      // day 3 arrives before day 2; day 1 gets a LATE row in the same batch
      Seq(Obs(d(3), 4, 12.0), Obs(d(3), 5, 3.0), Obs(d(1), 6, 9.0),
        Obs(d(3), 7, 5.0)),
      Seq(Obs(d(2), 8, 13.0), Obs(d(2), 9, 4.0), Obs(d(2), 10, 10.5),
        Obs(d(2), 11, 3.5)))

    val input = MemoryStream[Obs]
    val stats = StreamingMsprt.lookStats(
      input.toDF(), col("day"), col("uid") % 2 === 0, col("v"))
    val name = s"msprt_${System.nanoTime()}"
    val q = stats.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      var prefix = Seq.empty[Obs]
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
        prefix = prefix ++ b
        val batch = Evaluation.msprtMonitor(
          prefix.toDF(), col("day"), col("uid") % 2 === 0, col("v"),
          tau2 = 25.0)
          .collect().map(_.toString).toSeq
        val stream = Evaluation.finishMsprt(spark.table(name), tau2 = 25.0)
          .collect().map(_.toString).toSeq
        assert(stream == batch, s"diverged after ${prefix.size} rows")
      }
      // with treatment means ~3x control, the final look must reject
      val fin = Evaluation.finishMsprt(spark.table(name), tau2 = 25.0)
        .collect().last
      assert(fin.getBoolean(8), "expected a rejection by the last look")
    } finally q.stop()
  }

  test("finishMsprt: degenerate looks carry NULL llr and never reject") {
    import spark.implicits._
    // one arm empty on day 1; day 2 has both arms but zero variance
    val df = Seq(
      (d(1), 0L, 5.0), (d(1), 2L, 5.0),
      (d(2), 1L, 5.0), (d(2), 3L, 5.0), (d(2), 4L, 5.0), (d(2), 5L, 5.0))
      .toDF("day", "uid", "v")
    val out = Evaluation.msprtMonitor(
      df, col("day"), col("uid") % 2 === 0, col("v")).collect()
    assert(out.forall(_.isNullAt(6)), "llr must be NULL on degenerate looks")
    assert(out.forall(!_.getBoolean(8)), "no rejection without evidence")
  }
}
