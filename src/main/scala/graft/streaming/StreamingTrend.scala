package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Seasonal

/** Streaming leg of the trend/periodicity family — live Mann–Kendall
  * (x182), Theil–Sen (x185), ACF (x184), cross-correlation (x188) and
  * Friedman (x201, Seasonal.finishFriedman) over a continuously-arriving
  * event stream. The stateful half is the
  * SAME (series × day) running count every Seasonal view shares (one
  * commutative long per cell — exactly the aggregation state Structured
  * Streaming maintains incrementally); the four finishes are stateless
  * views shared verbatim with the batch operators
  * (Seasonal.finishMannKendall / finishTheilSen / finishAcf /
  * finishCcf), so batch and stream agree by construction: a late event
  * only ADDS to its day's count, and every pairwise statistic below is
  * re-derived from the bounded daily frame. No watermark needed —
  * the state is calendar-bounded, not corpus-bounded. */
object StreamingTrend {

  /** Running per-(series, day) counts over an event stream. Run with
    * OutputMode.Complete; finish with any of the Seasonal.finish* views. */
  def dailyCounts(
      stream: DataFrame,
      series: Column,
      ts: Column): DataFrame =
    Seasonal.dailyCounts(stream, series, ts)
}
