package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Survival

/** Streaming leg of the x170 Kaplan–Meier curve — the live churn monitor.
  * The stateful half is the per-entity activity span (min/max day — two
  * commutative dates per entity, the aggregation state Structured
  * Streaming maintains incrementally; a late event can only WIDEN a
  * span, so no watermark is needed and replays are idempotent). The
  * churn horizon, life table, and the order-pinned product-limit fold
  * are the stateless finishFromSpans view shared verbatim with batch —
  * the horizon is derived from the spans themselves, so it advances as
  * the stream does and the parity spec matches batch x170 after every
  * micro-batch under any arrival order. */
object StreamingKm {

  /** Running per-entity (first_d, last_d) spans over an event stream.
    * Run with OutputMode.Complete; finish with Survival.finishFromSpans. */
  def userSpans(stream: DataFrame, user: Column, ts: Column): DataFrame =
    Survival.userSpans(stream, user, ts)
}
