package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Seasonal

object StreamingHoltSpec {
  final case class Ev(series: String, ts: Timestamp)
}

/** Batch-vs-stream parity for the x161 Holt forecaster: streaming daily
  * counts + the shared finishHolt view must equal the batch forecast
  * over the prefix after EVERY micro-batch — including late arrivals
  * into an already-counted day (which re-walk the whole fold, since a
  * count change early in the series shifts every later level/trend). */
class StreamingHoltSpec extends SparkSpec {
  import StreamingHoltSpec.Ev

  private def ev(series: String, day: String, n: Int): Seq[Ev] =
    (1 to n).map(i => Ev(series, Timestamp.valueOf(s"2024-01-$day 0${i % 9}:00:00")))

  test("streaming daily counts + shared finish view equal the batch forecast " +
    "after every micro-batch, out-of-order arrivals included") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batches = Seq(
      ev("01", 2) ++ ev("02", 4) ++ ev("b", "01", 7),
      ev("04", 6) ++ ev("b", "03", 2),
      // late arrivals into Jan 1 (rewrites the fold's initial level) + new day
      ev("01", 3) ++ ev("07", 8))

    val input = MemoryStream[Ev]
    val out = StreamingHolt.dailyCounts(input.toDF(), col("series"), col("ts"))
    val name = s"holt_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      var prefix = Seq.empty[Ev]
      batches.foreach { b =>
        input.addData(b: _*); query.processAllAvailable()
        prefix = prefix ++ b
        val batch = Seasonal.holtLinear(prefix.toDF(), col("series"), col("ts"))
          .collect().map(_.toString).sorted.toSeq
        val streamed = Seasonal.finishHolt(spark.table(name))
          .collect().map(_.toString).sorted.toSeq
        assert(streamed == batch, s"divergence after batch with ${b.size} events")
      }
    } finally query.stop()
  }

  private def ev(day: String, n: Int): Seq[Ev] = ev("a", day, n)
}
