package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Skew

/** Streaming leg of the x141 join-key skew monitor — the live "which key
  * is about to straggle the next join" alarm over a continuously-
  * ingested fact stream. The stateful half is the per-key row count (one
  * commutative long per key — Structured Streaming's cheapest possible
  * aggregation state); the report arithmetic (summary, top-k, exact-ppm
  * shares, salt recommendation) is the stateless finishing view shared
  * verbatim with the batch report (Skew.finishSkewReport), so batch and
  * stream agree by construction. Counts only grow — no watermark needed,
  * any arrival order; the parity spec matches batch skewReport after
  * every micro-batch. */
object StreamingSkew {

  /** Running per-key counts over a stream. Run with OutputMode.Complete;
    * finish with Skew.finishSkewReport. */
  def runningKeyCounts(stream: DataFrame, key: Column): DataFrame =
    Skew.keyCounts(stream, key)
}
