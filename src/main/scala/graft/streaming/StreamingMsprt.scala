package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Evaluation

/** Streaming leg of the mSPRT sequential A/B monitor (x231): the whole
  * point of an always-valid test is to be PEEKED continuously, so the
  * live view is the natural deployment. State is the per-look six-sum
  * frame (n, Σq, Σq² per arm — exact integers, commutative, bounded by
  * the calendar), maintained as a plain streaming aggregation; the
  * log-likelihood-ratio readout is the stateless finish shared verbatim
  * with the batch operator (Evaluation.finishMsprt), so batch and stream
  * agree by construction under any arrival order — sums only grow, no
  * watermark needed. */
object StreamingMsprt {

  /** Running per-look per-arm sufficient statistics over a stream. Run
    * with OutputMode.Complete; finish with Evaluation.finishMsprt. */
  def lookStats(
      stream: DataFrame,
      look: Column,
      armA: Column,
      value: Column): DataFrame =
    Evaluation.lookArmStats(stream, look, armA, value)
}
