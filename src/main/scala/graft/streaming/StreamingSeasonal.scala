package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Seasonal

/** Streaming leg of the x121 weekday-seasonal anomaly monitor — the live
  * volume alarm for a continuously-harvested corpus (a crawler stalling
  * on Mondays looks normal against a global mean; against its own
  * weekday baseline it alarms immediately). The stateful half is the
  * (series × day) count — ONE commutative long per cell, exactly the
  * aggregation state Structured Streaming maintains incrementally; the
  * order-statistic baseline (low-median + MAD + Hampel flag) is
  * stateless and shared with the batch report
  * (Seasonal.finishWeekdayAnomalies), so batch and stream agree by
  * construction — the parity spec matches batch x121 after every
  * micro-batch, any arrival order, no watermark needed (counts only
  * grow, and the baseline is recomputed from the bounded daily frame). */
object StreamingSeasonal {

  /** Running per-(series, day) counts over an event stream. Run with
    * OutputMode.Complete; finish with Seasonal.finishWeekdayAnomalies. */
  def dailyCounts(
      stream: DataFrame,
      series: Column,
      ts: Column): DataFrame =
    Seasonal.dailyCounts(stream, series, ts)
}
