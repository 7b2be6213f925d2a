package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.MixtureSampling

/** Streaming leg of the x125 token-budget waterfill — a LIVE mixture
  * plan: as the intake grows, the per-source availability grows, and the
  * finishing view re-solves the allocation so downstream sampling always
  * has a current, budget-exact plan. The stateful half is the per-source
  * (Σsize, weight) pair — one growing long and one stable max, exactly
  * the aggregation state Structured Streaming maintains incrementally;
  * the whole waterfill algebra (ratio ordering, capped-prefix search,
  * largest-remainder rounding) is stateless and shared with the batch
  * planner (MixtureSampling.finishWaterfill), so batch and stream agree
  * by construction after every micro-batch, any arrival order. */
object StreamingWaterfill {

  /** Running per-source sizes over a stream. Run with
    * OutputMode.Complete; finish with MixtureSampling.finishWaterfill. */
  def sourceSizes(
      stream: DataFrame,
      group: Column,
      size: Column,
      weight: Column): DataFrame =
    MixtureSampling.sourceSizes(stream, group, size, weight)
}
