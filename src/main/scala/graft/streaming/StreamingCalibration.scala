package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Evaluation

/** Streaming leg of the x113 reliability diagram — the live calibration
  * monitor a deployed quality classifier needs (scores drift with the
  * input mix; a bin whose realized positive rate walks away from its mean
  * predicted score is the alarm). The stateful half is the per-bin
  * (n, Σscore, n_pos) statistics — three commutative numbers per bin,
  * exactly the aggregation state Structured Streaming maintains
  * incrementally; the rounding/gap view is stateless and shared with the
  * batch report (Evaluation.finishCalibration), so batch and stream agree
  * by construction — the parity spec matches batch x113 after every
  * micro-batch, any arrival order, no watermark needed (sums only grow). */
object StreamingCalibration {

  /** Running per-bin calibration statistics over a scored stream. Run with
    * OutputMode.Complete; finish with Evaluation.finishCalibration. */
  def binStats(
      scored: DataFrame,
      score: Column,
      label: Column,
      nBins: Int = 10): DataFrame =
    Evaluation.calibrationBinStats(scored, score, label, nBins)
}
