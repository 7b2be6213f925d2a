package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.TextAnalysis

/** Streaming leg of the x139 t-closeness audit — the live disclosure
  * monitor for a continuously-released corpus: as intake grows, a
  * quasi-identifier group can drift toward a rare sensitive value long
  * before any k-anonymity counter trips. The stateful half is one long
  * per observed (quasi × sensitive-value) cell — exactly the aggregation
  * state Structured Streaming maintains incrementally; the whole TVD
  * algebra (margins, complement-identity absent mass, decimal
  * cross-products, ppm division) is stateless and shared with the batch
  * audit (TextAnalysis.finishTcloseness), so batch and stream agree by
  * construction after every micro-batch, any arrival order, no watermark
  * needed (counts only grow). */
object StreamingTcloseness {

  /** Running (quasi × sensitive-value) cell counts over a stream. Run
    * with OutputMode.Complete; finish with
    * TextAnalysis.finishTcloseness. */
  def cellCounts(
      stream: DataFrame,
      quasi: Seq[(String, Column)],
      sensitive: Column): DataFrame =
    TextAnalysis.tClosenessCellCounts(stream, quasi, sensitive)
}
