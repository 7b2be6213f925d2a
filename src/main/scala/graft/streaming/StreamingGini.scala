package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.CorpusStats

/** Streaming leg of the x166 source-concentration report — the live
  * "is one domain eating the intake?" inequality monitor. The stateful
  * half is the per-source mass sum (ONE commutative long per source —
  * exactly the aggregation state Structured Streaming maintains
  * incrementally; late documents only ADD mass, so no watermark is
  * needed); the exact-integer Gini/head-share algebra is the stateless
  * finishConcentration view shared verbatim with batch, so the parity
  * spec matches batch x166 after every micro-batch under any arrival
  * order. */
object StreamingGini {

  /** Running per-source mass over a document stream. Run with
    * OutputMode.Complete; finish with CorpusStats.finishConcentration. */
  def sourceMasses(
      stream: DataFrame,
      sourceCol: Column,
      weightCol: Column): DataFrame =
    CorpusStats.sourceMasses(stream, sourceCol, weightCol)
}
