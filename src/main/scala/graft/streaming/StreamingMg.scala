package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

/** Streaming Misra–Gries heavy hitters — the streaming leg of
  * Sketches.mgHeavyHitters (x93's operator). Like the CMS and KMV legs,
  * the MG summary is what Structured Streaming's stateful aggregation
  * wants to keep: per-group state is the ≤ capacity (term, counter) map
  * (graft_mg_topk's TypedImperativeAggregate buffer); each micro-batch
  * folds its arrivals in and partials merge under the
  * subtract-(capacity+1)-th-largest rule — state never grows with the
  * vocabulary, only with capacity.
  *
  * Parity contract (StreamingMgSpec): in the exact regime (distinct ≤
  * capacity) the Complete-mode table equals batch mgHeavyHitters over
  * the processed prefix after every micro-batch — MG update order is
  * irrelevant when no decrement fires. Past capacity the stream keeps
  * the MG undercount guarantee but not bit-parity with any specific
  * batch partitioning (the estimates are summary-order-dependent),
  * which is the documented contract of the algorithm itself. */
object StreamingMg {

  /** Running per-group heavy hitters over a stream. Run with
    * OutputMode.Complete (group-count × topK sized result). */
  def runningHeavyHitters(
      df: DataFrame,
      termCol: Column,
      groupCol: String,
      capacity: Int = 256,
      topK: Int = 10): DataFrame =
    graft.operators.Sketches.mgHeavyHitters(df, termCol, groupCol, capacity, topK)
}
