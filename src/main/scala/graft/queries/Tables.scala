package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table loader. One parquet dataset per table under the sf dir
  * (see TESTDATA.md). Columnar parquet scans give Catalyst pushdown +
  * pruning for free; never collect these to the driver. */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped in three parquet encodings across testdata
    * generations; this loader is total over all of them and always yields
    * µs-precision TimestampType:
    *   - TIMESTAMP(NANOS): Spark's µs TimestampType cannot load it directly —
    *     read as long nanos and truncate to µs (integer `div`, not fp
    *     division: ns epochs exceed 2^53), matching DuckDB's epoch_us().
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ: reinterpret
    *     the wall-time as an instant under the session zone (entrypoints pin
    *     spark.sql.session.timeZone=UTC), which matches DuckDB's epoch_us()
    *     reading of the same naive timestamps.
    *   - TIMESTAMP(MICROS, UTC-adjusted): loads as TimestampType natively. */
  private def eventsDf(s: SparkSession, dir: String): DataFrame = {
    // nanosAsLong is needed only while this read resolves its schema —
    // restore the previous value so other parquet reads in the session keep
    // failing loudly on TIMESTAMP(NANOS) instead of silently loading longs
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val previous = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      val raw = s.read.parquet(s"$dir/events.parquet")
      raw.schema // force eager schema resolution under the flag
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } finally previous match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  def lineitem(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = apply(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = apply(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame    = apply(s, dir, "region")
  def events(s: SparkSession, dir: String): DataFrame    = eventsDf(s, dir)
  def documents(s: SparkSession, dir: String): DataFrame = apply(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = apply(s, dir, "embeddings")
}
