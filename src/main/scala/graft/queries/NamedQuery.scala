package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A query exposed through SparkEntry: the Spark implementation plus, when the
  * semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle statement.
  * Column names/aliases MUST match between the two (the driver sorts columns
  * by name before hashing); both sides carry a total ORDER BY so row order is
  * deterministic in either engine. */
final case class NamedQuery(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object NamedQuery {
  def sql(fn: (SparkSession, String) => DataFrame, oracle: String): NamedQuery =
    NamedQuery(fn, Some(oracle))
  def rowsOnly(fn: (SparkSession, String) => DataFrame): NamedQuery =
    NamedQuery(fn, None)
}
