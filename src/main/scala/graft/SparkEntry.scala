package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{NamedQuery, OperatorQueries, PipelineQueries, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from per-family packs under graft.queries; each entry
  * carries its own DuckDB oracle SQL when SQL-expressible (the driver compares
  * row/schema/hash at sf0.01). */
object SparkEntry {

  private def packs: Map[String, NamedQuery] =
    RelationalQueries.all ++ PipelineQueries.all ++ OperatorQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    packs("q01_lineitem_agg").fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. Registration of
    * graft's catalyst functions is idempotent and session-scoped, so wrap
    * every query — the caller's session may not carry our extensions. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map { case (name, q) =>
      name -> { (s: SparkSession, dir: String) =>
        graft.functions.GraftFunctions.register(s)
        q.fn(s, dir)
      }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.collect { case (name, NamedQuery(_, Some(sqlText))) => name -> sqlText }
}
