package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Survival

object StreamingKmSpec {
  final case class Ev(u: String, t: Timestamp)
}

/** Batch-vs-stream parity for the x170 Kaplan–Meier curve: streaming
  * per-entity spans + the shared finish must equal the batch curve over
  * the prefix after EVERY micro-batch — late events widen spans, and
  * each batch can advance the churn horizon, flipping earlier entities
  * between censored and churned. */
class StreamingKmSpec extends SparkSpec {
  import StreamingKmSpec.Ev

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d 09:00:00")

  test("streaming spans + shared finish equal batch after every batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batches = Seq(
      Seq(Ev("a", ts(1)), Ev("a", ts(3)), Ev("b", ts(2))),
      // horizon jumps to day 20: a (last=3) becomes churned
      Seq(Ev("c", ts(4)), Ev("c", ts(20))),
      // late event widens b's span out of churn
      Seq(Ev("b", ts(19)), Ev("d", ts(5)), Ev("d", ts(9))))

    val input = MemoryStream[Ev]
    val out = StreamingKm.userSpans(input.toDF(), col("u"), col("t"))
    val name = s"km_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      var prefix = Seq.empty[Ev]
      batches.foreach { b =>
        input.addData(b: _*); query.processAllAvailable()
        prefix = prefix ++ b
        val batch = Survival.kaplanMeier(
          prefix.toDF(), col("u"), col("t"), churnGapDays = 7)
          .orderBy("duration").collect().map(_.toString).toSeq
        val streamed = Survival.finishFromSpans(
          spark.table(name), churnGapDays = 7)
          .orderBy("duration").collect().map(_.toString).toSeq
        assert(streamed == batch, s"divergence after ${prefix.size} events")
        // the Nelson–Aalen lens shares the same spans → life-table state
        val naBatch = Survival.nelsonAalen(
          prefix.toDF(), col("u"), col("t"), churnGapDays = 7)
          .orderBy("duration").collect().map(_.toString).toSeq
        val naStreamed = Survival.finishNa(Survival.lifeTable(
          Survival.spansToDurations(spark.table(name), churnGapDays = 7)))
          .orderBy("duration").collect().map(_.toString).toSeq
        assert(naStreamed == naBatch,
          s"nelson–aalen divergence after ${prefix.size} events")
      }
    } finally query.stop()
  }
}
