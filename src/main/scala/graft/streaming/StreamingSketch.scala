package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming count-min sketch — the streaming leg of Sketches (batch form
  * in operators/Sketches.scala). The CMS is a LINEAR sketch: cell counts
  * are plain sums, so Structured Streaming's incremental stateful
  * aggregation IS the sketch-maintenance algorithm — each micro-batch adds
  * its token occurrences into the running (row, cell) grid, and the state
  * store holds at most depth × width rows forever, the strongest possible
  * state bound (it does not even grow with the key cardinality the
  * watermark would otherwise govern).
  *
  * Parity contract (pinned by StreamingSketchSpec): after processing any
  * prefix of the stream, the sketch table equals the batch
  * Sketches.countMinTokenSketch of the same documents — the hash family is
  * shared, and addition is order-independent.
  */
object StreamingSketch {

  /** Running (row, cell, cnt) sketch over a document stream. Complete
    * output mode fits a ≤ d·w-row result; downstream estimate reads join
    * it exactly like the batch path (broadcast, min over rows). Width and
    * depth follow the batch operator's contracts (power-of-two width,
    * depth ≤ seed family). */
  def runningTokenSketch(
      docs: DataFrame,
      textCol: String,
      width: Int,
      depth: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // The batch plan IS the streaming plan: a stateful groupBy over the
    // shared cell projection. Run with OutputMode.Complete.
    graft.operators.Sketches.countMinTokenSketch(docs, textCol, width, depth)
  }
}
