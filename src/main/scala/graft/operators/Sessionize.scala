package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-analytics operator the
  * reference's check-history queries (db/check.py:71-84) stop just short of:
  * group a key's event stream into sessions separated by idle gaps longer
  * than `gapMicros`.
  *
  * Shape: ONE shuffle on the key, then two window passes over the same
  * (key, ts, tie) sort order — lag() to mark session starts, running sum to
  * number them. Catalyst executes both windows in a single Window operator
  * chain over one Exchange+Sort, so the cost at 100 TB is exactly one
  * keyed repartition; no global ordering, no driver state. Skewed keys (one
  * user with millions of events) stay correct — a window over a single key
  * is single-task, which is inherent to per-key ordering; for pathological
  * skew, pre-split by day and stitch at boundaries.
  *
  * Ordering inside a key is (event time, tieCol) — the tie-break keeps the
  * session numbering deterministic when timestamps collide (equal-ts rows
  * are common in upstream batch loads).
  */
object Sessionize {

  /** Add a `session_idx` column (1-based per key, in time order): a row
    * starts a new session when it is the key's first row or follows a gap
    * strictly greater than `gapMicros`. Rows otherwise pass through. */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapMicros: Long): DataFrame = {
    require(gapMicros > 0, "session gap must be positive")
    require(!df.columns.contains("session_idx"),
      "sessionize reserves the output column name session_idx")
    val order = Seq(unix_micros(col(tsCol)), col(tieCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || us - prev > gapMicros, 1L).otherwise(0L)
    df.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session summary: (key, session_idx, n_events, start_us, end_us,
    * duration_us). The aggregation reuses the sessionize shuffle's
    * partitioning (groupBy key+session after a window partitioned by key —
    * Spark reuses the exchange when the grouping is a superset). */
  def sessionSummary(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapMicros: Long): DataFrame = {
    val us = unix_micros(col(tsCol))
    sessionize(df, keyCol, tsCol, tieCol, gapMicros)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(us).as("start_us"),
        max(us).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
