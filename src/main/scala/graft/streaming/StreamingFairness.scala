package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Evaluation

/** Streaming leg of the group-fairness audit (x230) — the live "is the
  * quality gate silently deleting one cohort?" dashboard over a scored
  * stream. State is the per-group six-long confusion-cell frame
  * (Evaluation.fairnessCells — plain commutative sums, bounded by
  * |groups|, no watermark); the demographic-parity / equalized-odds
  * readout is the stateless finish shared verbatim with the batch
  * operator, so batch and stream agree by construction under any
  * arrival order. */
object StreamingFairness {

  /** Running per-group confusion cells over a stream. Run with
    * OutputMode.Complete; finish with Evaluation.finishFairness. */
  def cells(
      stream: DataFrame,
      group: Column,
      pred: Column,
      label: Column): DataFrame =
    Evaluation.fairnessCells(stream, group, pred, label)
}
