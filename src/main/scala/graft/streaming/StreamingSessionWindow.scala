package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native session_window aggregation — the streaming twin of the d36
  * batch query, via Structured Streaming's built-in session windows
  * (merging-window state store) rather than the custom
  * flatMapGroupsWithState sessionizer (StreamingSessionize, the d20
  * twin): when the built-in operator expresses the semantics, prefer it —
  * the state store handles window merge, spill and exactly-once for free.
  *
  * The SAME function body serves both execution modes (the plan is
  * identical; only the source differs), which is what the parity spec
  * leans on: batch output == streaming output over any in-watermark
  * delivery order, because Append-mode session finalization emits each
  * merged window exactly once with the same bounds/aggregates the batch
  * aggregation computes.
  *
  * Streaming callers must put a watermark on `ts` BEFORE calling (the
  * lateness horizon is theirs to pick); sessions finalize when the
  * watermark passes their end. Output: user_id, session bounds in micros,
  * n_events, sum_value (2-decimal half-up rounding, d36's contract).
  */
object StreamingSessionWindow {

  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    def rnd2(c: org.apache.spark.sql.Column) =
      floor(c * lit(100.0) + lit(0.5)) / lit(100.0)
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), rnd2(sum(col("value"))).as("sum_value"))
      .select(col("user_id"),
        expr("unix_micros(sw.start)").as("session_start_us"),
        expr("unix_micros(sw.end)").as("session_end_us"),
        col("n_events"), col("sum_value"))
  }
}
