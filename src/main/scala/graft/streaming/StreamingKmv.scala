package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming KMV distinct estimation — the streaming leg of
  * Sketches.kmvDistinct (x82's operator). Like the CMS (StreamingSketch),
  * the KMV sketch is exactly the thing Structured Streaming's stateful
  * aggregation wants to hold: the per-group state is the k-bounded sorted
  * set of smallest draws (graft_kmv_agg's TypedImperativeAggregate
  * buffer), each micro-batch folds its draws in, and merge = union then
  * re-take the bottom k — so state NEVER grows with the key cardinality,
  * only k doubles per group.
  *
  * Estimate-only by construction: the batch report's n_exact audit column
  * is a distinct aggregation, which streaming cannot maintain
  * incrementally (and which would defeat the bounded-state point).
  * Parity contract (StreamingKmvSpec): after any processed prefix, the
  * Complete-mode table equals batch Sketches.kmvEstimate over the same
  * rows — the draw function is shared and insertion is order-independent.
  */
object StreamingKmv {

  /** Running per-group estimate over a stream. Run with
    * OutputMode.Complete (group-count-sized result). */
  def runningDistinctEstimate(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      k: Int = 64): DataFrame =
    graft.operators.Sketches.kmvEstimate(df, keyCol, groupCol, k)
}
