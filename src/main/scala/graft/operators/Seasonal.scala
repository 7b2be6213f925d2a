package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seasonality-adjusted anomaly detection on an event stream — the
  * monitor a continuously-harvested corpus needs: raw daily volume is
  * dominated by the weekly cycle, so a useful alert compares each day
  * against its OWN weekday's typical volume, not a global mean.
  *
  * Per (series, day): the day's count, the low-median of that series ×
  * ISO-weekday's daily counts, the MAD (low-median of absolute
  * deviations from that median), and a Hampel-style flag
  * `|cnt − med| > k · mad`. Exact integer arithmetic end to end — counts
  * are longs, the low-median is an order statistic (row at position
  * ⌊(n+1)/2⌋ ascending), so the report is bit-replayable in SQL and
  * independent of partitioning. A strict `>` keeps constant series
  * (mad = 0, dev = 0) unflagged while any nonzero deviation on a
  * zero-mad series flags — the sharpest possible alert.
  *
  * Scale shape: ONE keyed aggregation collapses the raw stream to
  * (series × day) counts — partial map-side combine, two-long state —
  * and every window below runs on that bounded frame (|series| × |days|
  * rows, thousands not billions), never on raw events. */
object Seasonal {

  def weekdayAnomalies(
      df: DataFrame,
      series: Column,
      ts: Column,
      k: Int = 3): DataFrame =
    finishWeekdayAnomalies(dailyCounts(df, series, ts), k)

  /** The STATEFUL half of the monitor: per (series, day) counts — one
    * commutative long per cell, the aggregation state Structured
    * Streaming maintains incrementally (streaming/StreamingSeasonal). */
  def dailyCounts(df: DataFrame, series: Column, ts: Column): DataFrame =
    df.groupBy(series.cast("string").as("series"), to_date(ts).as("day"))
      .agg(count(lit(1)).as("cnt"))

  /** The stateless finishing view over the (series × day) counts: the
    * order-statistic baseline and the Hampel flag. Shared by the batch
    * report and the streaming twin's consumer. */
  def finishWeekdayAnomalies(dailyIn: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, "weekdayAnomalies: k must be >= 1")
    val daily = dailyIn
      .withColumn("dow", (weekday(col("day")) + lit(1)).cast("int"))
    val grp = Window.partitionBy("series", "dow")
    // low-median of cnt within (series, isodow): order statistic at
    // position (n+1)/2 — ties in cnt cannot change the selected VALUE
    val byCnt = grp.orderBy(col("cnt"), col("day"))
    val withMed = daily
      .withColumn("__rn", row_number().over(byCnt))
      .withColumn("__n", count(lit(1)).over(grp))
      .withColumn("med",
        max(when(col("__rn") === expr("(__n + 1) div 2"), col("cnt"))).over(grp))
      .withColumn("dev", abs(col("cnt") - col("med")))
    val byDev = grp.orderBy(col("dev"), col("day"))
    withMed
      .withColumn("__rd", row_number().over(byDev))
      .withColumn("mad",
        max(when(col("__rd") === expr("(__n + 1) div 2"), col("dev"))).over(grp))
      .select(col("series"), col("day"), col("dow"), col("cnt"),
        col("med"), col("mad"), col("dev"),
        (col("dev") > lit(k.toLong) * col("mad")).as("flagged"))
  }
}
