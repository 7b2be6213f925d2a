package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Seasonal

/** Streaming leg of the x161 Holt forecaster — the live level+trend
  * projection over a continuously-arriving event stream. The stateful
  * half is the SAME (series × day) running count that already powers the
  * seasonal/CUSUM/health twins (one commutative long per cell — exactly
  * the aggregation state Structured Streaming maintains incrementally);
  * the Holt fold is a stateless finishing view shared verbatim with the
  * batch forecaster (Seasonal.finishHolt), so batch and stream agree by
  * construction: the parity spec matches batch x161 after every
  * micro-batch under any arrival order, no watermark needed — a late
  * event only ADDS to its day's count, and the fold re-walks the bounded
  * per-series day array. */
object StreamingHolt {

  /** Running per-(series, day) counts over an event stream. Run with
    * OutputMode.Complete; finish with Seasonal.finishHolt. */
  def dailyCounts(
      stream: DataFrame,
      series: Column,
      ts: Column): DataFrame =
    Seasonal.dailyCounts(stream, series, ts)
}
