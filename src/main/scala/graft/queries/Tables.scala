package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Test-table loader. One parquet dataset per table under the sf dir
  * (see TESTDATA.md). Columnar parquet scans give Catalyst pushdown +
  * pruning for free; never collect these to the driver. */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's µs TimestampType
    * cannot load directly — read it as long nanos and truncate to µs
    * (integer `div`, not fp division: ns epochs exceed 2^53). This matches
    * DuckDB's epoch_us() truncation, so oracles agree. */
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
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
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
