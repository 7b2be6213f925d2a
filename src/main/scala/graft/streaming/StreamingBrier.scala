package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Evaluation

/** Streaming leg of the x194 Brier decomposition — the live sharpness/
  * calibration monitor next to StreamingCalibration's per-bin diagram.
  * The stateful half is the per-bin (n, Σs4, Σs4², n_pos, Σs4_pos)
  * statistics over the INTEGER-quantized score — five commutative
  * numbers per bin, exactly the aggregation state Structured Streaming
  * maintains incrementally, and (unlike x113's fp sums) EXACT, so batch
  * and stream agree bit-for-bit under any arrival order. The Murphy
  * decomposition view is stateless and shared with the batch report
  * (Evaluation.finishBrier); parity holds after every micro-batch, no
  * watermark needed (sums only grow). */
object StreamingBrier {

  /** Running per-bin quantized-score statistics over a scored stream.
    * Run with OutputMode.Complete; finish with Evaluation.finishBrier. */
  def binStats(
      scored: DataFrame,
      score: Column,
      label: Column,
      nBins: Int = 10): DataFrame =
    Evaluation.brierBinStats(scored, score, label, nBins)
}
