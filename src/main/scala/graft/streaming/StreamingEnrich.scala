package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join: enrich a continuously-arriving document stream with
  * a (possibly later-arriving) metadata stream — the intake-side companion
  * of StreamingIntake. Structured Streaming buffers BOTH sides in state, so
  * the join is only scale-safe when the engine can evict: each side carries
  * a watermark AND the join predicate bounds how far the two event times
  * may diverge (`maxDelayed`). State per key is then O(rows within the
  * divergence window), not O(stream).
  *
  * Inner mode emits as matches arrive; left_outer additionally emits
  * null-metadata rows once the watermark proves no match can still come —
  * exactly the semantics a downstream "docs missing their metadata" monitor
  * needs. (Spark requires the time-bound predicate for outer stream-stream
  * joins; without it state would be unbounded and results undefined.) */
object StreamingEnrich {

  /** Join `docs` (docId, ..., tsCol) to `meta` (docId, ..., metaTsCol).
    *
    * @param maxDelayed how far metadata event time may trail or lead the
    *                   document event time, e.g. "10 minutes" — becomes the
    *                   join's time-range bound and the state horizon
    * @param joinType   "inner" or "left_outer" */
  def joinWithMetadata(
      docs: DataFrame,
      meta: DataFrame,
      idCol: String,
      tsCol: String,
      metaTsCol: String,
      watermark: String,
      maxDelayed: String,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"joinType must be inner|left_outer, got $joinType")
    // only the meta id is renamed away; any OTHER shared column name (e.g.
    // both sides calling their event time "ts") would make the join
    // condition ambiguous at analysis — fail loud instead
    val shared = meta.columns.toSet.intersect(docs.columns.toSet) - idCol
    require(shared.isEmpty,
      s"docs and meta share non-key columns ${shared.mkString(",")}; " +
        "rename or drop them on one side before joining")
    require(!docs.columns.contains("__meta_id") && !meta.columns.contains("__meta_id"),
      "joinWithMetadata reserves the column name __meta_id")
    val d = docs.withWatermark(tsCol, watermark)
    val m = meta
      .withColumnRenamed(idCol, "__meta_id")
      .withWatermark(metaTsCol, watermark)
    d.join(m,
      col(idCol) === col("__meta_id") &&
        col(metaTsCol) >= col(tsCol) - expr(s"INTERVAL $maxDelayed") &&
        col(metaTsCol) <= col(tsCol) + expr(s"INTERVAL $maxDelayed"),
      joinType)
      .drop("__meta_id")
  }
}
