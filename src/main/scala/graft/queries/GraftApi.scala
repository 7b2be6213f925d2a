package graft.queries

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.MetaStore

/** §F — the reference's HTTP API surface as library calls returning
  * DataFrames (routes/__init__.py:51-77; response shapes in schemas/).
  * The HTTP layer itself is out of scope by design (SURVEY §2-F): every
  * route body was a single query + serialization, and these are the
  * queries. */
final class GraftApi(spark: SparkSession, store: MetaStore) {

  private def catalog = store.load("catalog").getOrElse(spark.emptyDataFrame)
  private def checks = store.load("checks").getOrElse(spark.emptyDataFrame)

  /** GET /api/checks/latest?url=|resource_id= */
  def checksLatest(url: Option[String] = None, resourceId: Option[String] = None): DataFrame = {
    val cond = (url.map(col("url") === _) ++ resourceId.map(col("resource_id") === _))
      .reduceOption(_ && _).getOrElse(lit(true))
    ChecksQueries.latestCheck(catalog, checks, cond)
  }

  /** GET /api/checks/all?url=|resource_id= */
  def checksAll(url: Option[String] = None, resourceId: Option[String] = None): DataFrame = {
    val cond = (url.map(col("url") === _) ++ resourceId.map(col("resource_id") === _))
      .reduceOption(_ && _).getOrElse(lit(true))
    ChecksQueries.allChecks(checks, cond)
  }

  /** GET /api/checks/aggregate?group_by=&created_at= */
  def checksAggregate(groupBy: String, day: Date): DataFrame =
    ChecksQueries.aggregateByColumn(checks, groupBy, day)

  /** GET /api/resources/{id} */
  def resource(resourceId: String): DataFrame =
    catalog.filter(col("resource_id") === resourceId)

  /** GET /api/status/crawler */
  def statusCrawler(now: Timestamp): DataFrame =
    ChecksQueries.crawlerStatus(catalog, now)

  /** GET /api/stats */
  def stats(): DataFrame = ChecksQueries.stats(checks)

  /** GET /api/health — storage reachable + table presence flags. */
  def health(): DataFrame = {
    import spark.implicits._
    Seq((store.exists("catalog"), store.exists("checks"), store.exists("tables_index")))
      .toDF("catalog", "checks", "tables_index")
  }
}
