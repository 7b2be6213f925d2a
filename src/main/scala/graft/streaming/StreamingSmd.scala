package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Evaluation

/** Streaming leg of the SMD covariate-balance audit (x240) — the live
  * "did the randomizer break mid-experiment?" monitor over an assignment
  * stream. State is the per-covariate six-sum frame
  * (Evaluation.smdCells — plain commutative integer/decimal sums,
  * bounded by |covariates|, no watermark); the standardized-mean-
  * difference readout is the stateless finish shared verbatim with the
  * batch operator, so batch and stream agree by construction under any
  * arrival order. */
object StreamingSmd {

  /** Running per-covariate moment cells over a stream. Run with
    * OutputMode.Complete; finish with Evaluation.finishSmd. */
  def cells(
      stream: DataFrame,
      treatment: Column,
      covariates: Seq[(String, Column)]): DataFrame =
    Evaluation.smdCells(stream, treatment, covariates)
}
