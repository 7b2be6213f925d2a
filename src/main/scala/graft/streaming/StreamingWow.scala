package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming weekly rollup — the streaming leg of the d39 week-over-week
  * report. The rollup (epoch-aligned 7-day tumbling windows per event
  * type) is the part that needs STATE, and it is exactly the shape
  * Structured Streaming's windowed aggregation maintains incrementally;
  * the week-over-week comparison itself is a stateless lag view over the
  * tiny type×week result, applied by the consumer (the parity spec does
  * precisely that and matches batch d39 row-for-row).
  *
  * Week buckets are epoch divisions: Spark's window(ts, "7 days") aligns
  * to the epoch, so floor(unix_micros(start)/week_µs) reproduces the batch
  * query's integer bucket ids exactly — boundaries cannot disagree. */
object StreamingWow {

  private def rnd4(c: org.apache.spark.sql.Column) =
    floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** Running (event_type, week) rollup over a stream with columns
    * (event_type, ts, value). Run with OutputMode.Complete. */
  def weeklyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), window(col("ts"), "7 days").as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("__sv"))
      .select(col("event_type"),
        floor(unix_micros(col("w.start")) / lit(604800000000L)).cast("long").as("week"),
        col("n_events"), rnd4(col("__sv")).as("sum_value"))
}
