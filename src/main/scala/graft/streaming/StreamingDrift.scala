package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Evaluation

/** Streaming leg of the x123 distribution-drift monitor — the live mix
  * alarm for a continuously-ingested corpus (a category vanishing from
  * the intake, a new source flooding one bin). The stateful half is the
  * per-bin (cnt_a, cnt_b) pair — two commutative longs per bin, exactly
  * the aggregation state Structured Streaming maintains incrementally;
  * the TVD algebra (decimal cross-products, ppm divisions, `__total`
  * row) is stateless and shared with the batch report
  * (Evaluation.finishDrift), so batch and stream agree by construction —
  * the parity spec matches batch x123 after every micro-batch, any
  * arrival order, no watermark needed (counts only grow). */
object StreamingDrift {

  /** Running per-bin cohort counts over a stream. Run with
    * OutputMode.Complete; finish with Evaluation.finishDrift. */
  def binCounts(
      stream: DataFrame,
      bin: Column,
      inA: Column): DataFrame =
    Evaluation.driftBinCounts(stream, bin, inA)
}
