package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.DataQuality

/** Streaming leg of the x169 Benford audit — the live "did the intake's
  * leading-digit mix just go un-Benford?" monitor for a monetary feed.
  * The stateful half is the per-digit count (≤ 9 commutative longs —
  * exactly the aggregation state Structured Streaming maintains; late
  * values only ADD counts, so no watermark is needed); the exact
  * integer-ppm χ² finish is the stateless finishBenford view shared
  * verbatim with batch, so the parity spec matches batch x169 after
  * every micro-batch under any arrival order. */
object StreamingBenford {

  /** Running per-digit counts over a value stream. Run with
    * OutputMode.Complete; finish with DataQuality.finishBenford. */
  def digitCounts(stream: DataFrame, value: Column): DataFrame =
    DataQuality.benfordDigitCounts(stream, value)
}
