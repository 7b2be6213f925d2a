package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A query exposed through SparkEntry: the Spark implementation plus, when the
  * semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle statement.
  * Column names/aliases MUST match between the two (the driver sorts columns
  * by name before hashing); both sides carry a total ORDER BY so row order is
  * deterministic in either engine.
  *
  * Output-cache contract: many builders end with the
  * `out.cache(); out.count(); <operator>.releaseCaches(); out` epilogue —
  * internal operator caches release inside the builder, but the OUTPUT
  * cache is deliberately left pinned for the caller to consume. Bench and
  * Verify clear it per query (`cacheManager.clearCache()` +
  * `getPersistentRDDs.unpersist`); any OTHER caller of SparkEntry.queries
  * must do the same after consuming the frame or it leaks one output cache
  * per invocation. */
final case class NamedQuery(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object NamedQuery {
  def sql(fn: (SparkSession, String) => DataFrame, oracle: String): NamedQuery =
    NamedQuery(fn, Some(oracle))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): NamedQuery =
    NamedQuery(fn, None)
}
