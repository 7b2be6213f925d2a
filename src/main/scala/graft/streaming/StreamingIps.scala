package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Evaluation

/** Streaming leg of the IPS off-policy audit (x238) — the live "could we
  * evaluate a different policy from these logs?" dashboard over an event
  * stream. State is the per-action two-long frame
  * (Evaluation.ipsActionCells — plain commutative sums, bounded by
  * |actions|, no watermark); the IPS/SNIPS/ESS readout is the stateless
  * finish shared verbatim with the batch operator, so batch and stream
  * agree by construction under any arrival order. */
object StreamingIps {

  /** Running per-action (count, quantized reward sum) cells over a
    * stream. Run with OutputMode.Complete; finish with
    * Evaluation.finishIps. */
  def cells(stream: DataFrame, action: Column, reward: Column): DataFrame =
    Evaluation.ipsActionCells(stream, action, reward)
}
