package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

object StreamingWowSpec {
  final case class WowEvent(eventType: String, ts: Timestamp, value: Double)
}

/** Batch-vs-stream parity for d39's weekly rollup, including the stateless
  * lag view that completes the week-over-week report. */
class StreamingWowSpec extends SparkSpec {
  import StreamingWowSpec.WowEvent

  private def ts(day: Int, hour: Int = 9) =
    Timestamp.valueOf(f"2024-06-${day}%02d $hour%02d:00:00")

  test("streaming weekly rollup + lag view equals the batch d39 shape after every batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batches = Seq(
      Seq(WowEvent("click", ts(3), 1.5), WowEvent("click", ts(4), 2.0),
        WowEvent("view", ts(5), 0.5)),
      // second week arrives before a LATE first-week event
      Seq(WowEvent("click", ts(11), 3.0), WowEvent("click", ts(12), 1.0),
        WowEvent("view", ts(13), 2.5)),
      Seq(WowEvent("click", ts(5), 4.0), WowEvent("click", ts(19), 1.0)))

    val input = MemoryStream[WowEvent]
    val out = StreamingWow.weeklyRollup(
      input.toDF().withColumnRenamed("eventType", "event_type"))
    val name = s"wow_${System.nanoTime()}"
    val query = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()

    def rnd4(c: org.apache.spark.sql.Column) =
      floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)
    var prefix = Seq.empty[WowEvent]
    batches.foreach { b =>
      input.addData(b: _*); query.processAllAvailable()
      prefix = prefix ++ b
      // the d39 batch pipeline over the prefix
      val w = Window.partitionBy("event_type").orderBy("week")
      val batchD39 = prefix.toDF("event_type", "ts", "value")
        .groupBy(col("event_type"),
          floor(unix_micros(col("ts")) / lit(604800000000L)).cast("long").as("week"))
        .agg(count(lit(1)).as("n_events"), rnd4(sum(col("value"))).as("sum_value"))
        .withColumn("__pn", lag(col("n_events"), 1).over(w))
        .select(col("event_type"), col("week"), col("n_events"), col("sum_value"),
          when(col("__pn").isNotNull && col("__pn") =!= 0,
            rnd4((col("n_events") - col("__pn")).cast("double") / col("__pn")))
            .as("wow_events_pct"))
        .collect().map(_.toString).sorted.toSeq
      // streaming rollup + the same stateless lag view
      val streamed = spark.table(name)
        .withColumn("__pn", lag(col("n_events"), 1).over(w))
        .select(col("event_type"), col("week"), col("n_events"), col("sum_value"),
          when(col("__pn").isNotNull && col("__pn") =!= 0,
            rnd4((col("n_events") - col("__pn")).cast("double") / col("__pn")))
            .as("wow_events_pct"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batchD39, s"after ${prefix.size} events")
    }
    query.stop()
  }
}
