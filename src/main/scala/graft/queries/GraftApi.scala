package graft.queries

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.MetaStore

object GraftApi {
  /** 401 — missing Authorization (utils/auth.py:52-54). */
  final class Unauthorized(reason: String) extends RuntimeException(reason)
  /** 403 — malformed header, wrong scheme, or wrong token (auth.py:56-68). */
  final class Forbidden(reason: String) extends RuntimeException(reason)
}

/** §F — the reference's HTTP API surface as library calls returning
  * DataFrames (routes/__init__.py:51-77; response shapes in schemas/).
  * The HTTP layer itself is out of scope by design (SURVEY §2-F): every
  * route body was a single query + serialization, and these are the
  * queries.
  *
  * Auth (utils/auth.py:16-72 + app.py:18): when `apiKey` is set, every
  * mutating call must pass `authorization = Some("Bearer <key>")`; the
  * GET-shaped reads stay open (`exclude_methods=("GET",)`). With no
  * `apiKey` the surface is open — the reference's middleware simply isn't
  * installed. */
final class GraftApi(spark: SparkSession, store: MetaStore,
    apiKey: Option[String] = None) {

  /** The token check, per mutating call — the middleware body: 401 when the
    * header is absent, 403 when it doesn't split into exactly
    * (scheme, token), the scheme isn't Bearer (case-insensitive), or the
    * token mismatches. */
  private def authorize(authorization: Option[String]): Unit =
    apiKey.foreach { key =>
      val header = authorization.getOrElse(
        throw new GraftApi.Unauthorized("Missing authorization header"))
      val parts = header.trim.split(" ")
      if (parts.length != 2)
        throw new GraftApi.Forbidden("Invalid authorization header")
      if (!parts(0).equalsIgnoreCase("Bearer"))
        throw new GraftApi.Forbidden("Invalid token scheme")
      if (parts(1) != key)
        throw new GraftApi.Forbidden("Invalid authentication token")
    }

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

  /** GET /api/status/worker — the reference reports RQ queue depths; the
    * library analog is in-flight resources per status (NULL = idle/waiting),
    * the same work-in-progress picture without the Redis dependency. */
  def statusWorker(): DataFrame = ChecksQueries.resourceStatusCounts(catalog)

  /** GET /api/health — storage reachable + table presence flags. */
  def health(): DataFrame = {
    import spark.implicits._
    Seq((store.exists("catalog"), store.exists("checks"), store.exists("tables_index")))
      .toDF("catalog", "checks", "tables_index")
  }

  // ---- write surface (routes/resources.py, routes/resources_exceptions.py).
  // HTTP error codes become exceptions/Booleans: 400 → IllegalArgumentException,
  // 404 → false / None return. -------------------------------------------------

  import graft.model.ResourceStatus

  private def requireValidStatus(status: Option[String]): Unit =
    status.foreach { s =>
      require(ResourceStatus.valid.contains(s), s"Invalid status: $s")
    }

  /** GET /api/resources/{id}/status — status + verbose explanation. */
  def resourceStatus(resourceId: String): Option[(Option[String], String)] = {
    val rows = catalog.filter(col("resource_id") === resourceId)
      .select("status").collect()
    rows.headOption.map { r =>
      val s = Option(r.getString(0))
      (s, ResourceStatus.verbose.getOrElse(s, ""))
    }
  }

  /** POST /api/resources — create in the catalog, priority for next crawl
    * (Resource.insert: deleted=FALSE, priority=TRUE default). */
  def createResource(datasetId: String, resourceId: String, url: String,
      status: Option[String] = None, priority: Boolean = true,
      authorization: Option[String] = None): Unit = {
    authorize(authorization)
    requireValidStatus(status)
    import spark.implicits._
    store.upsert("catalog",
      Seq((resourceId, datasetId, url, false, status.orNull, priority))
        .toDF("resource_id", "dataset_id", "url", "deleted", "status", "priority"),
      "resource_id")
  }

  /** PUT /api/resources/{id} — update-or-insert, re-prioritized
    * (Resource.update_or_insert: same column set either way). */
  def updateResource(datasetId: String, resourceId: String, url: String,
      status: Option[String] = None, priority: Boolean = true,
      authorization: Option[String] = None): Unit =
    createResource(datasetId, resourceId, url, status, priority, authorization)

  /** DELETE /api/resources/{id} — tombstone, not a hard delete. Returns
    * false when the resource is unknown (404). */
  def deleteResource(resourceId: String,
      authorization: Option[String] = None): Boolean = {
    authorize(authorization)
    if (resource(resourceId).isEmpty) return false
    import spark.implicits._
    store.upsert("catalog",
      Seq((resourceId, true)).toDF("resource_id", "deleted"), "resource_id")
    true
  }

  /** POST /api/checks — the reference enqueues an immediate re-check; the
    * library equivalent marks the resource priority so the next selectBatch
    * picks it first. Returns false when the resource is unknown. */
  def createCheck(resourceId: String,
      authorization: Option[String] = None): Boolean = {
    authorize(authorization)
    if (resource(resourceId).isEmpty) return false
    import spark.implicits._
    store.upsert("catalog",
      Seq((resourceId, true, null: String))
        .toDF("resource_id", "priority", "status"),
      "resource_id")
    true
  }

  private def resourcesExceptionsDf =
    store.load("resources_exceptions").getOrElse(spark.emptyDataFrame)

  /** Index types the DDL layer supports (SQL_INDEXES_TYPES_SUPPORTED). */
  val supportedIndexTypes: Set[String] = Set("index")

  private def validateIndexes(tableIndexes: Map[String, String]): Unit =
    tableIndexes.values.foreach { t =>
      require(supportedIndexTypes.contains(t),
        "error, index type must be one of: " + supportedIndexTypes.mkString(", "))
    }

  /** Validate a table_indexes request against a DETECTED column profile
    * (FormatDetector.inferWithFormats' output): every requested column
    * must exist in the analyzed table — an index request for a column the
    * csv-detective report does not carry is a config typo that the
    * reference only discovers at CREATE INDEX time; surfacing it at CRUD
    * time keeps the exception table consistent with what analysis will
    * actually build. Returns the requested columns' detected formats
    * (format-aware callers use them to pick index kinds — a `siren` or
    * `code_postal` column is a natural equality-index candidate, free
    * text is not). */
  def validateIndexesAgainstProfile(
      tableIndexes: Map[String, String],
      profile: Map[String, graft.model.ColumnInfo]): Map[String, String] = {
    validateIndexes(tableIndexes)
    val missing = tableIndexes.keySet -- profile.keySet
    require(missing.isEmpty,
      "error, indexed column(s) not present in the analyzed table: " +
        missing.toSeq.sorted.mkString(", "))
    tableIndexes.keys.map(c => c -> profile(c).format).toMap
  }

  private def indexesJson(m: Map[String, String]): String =
    m.map { case (k, v) =>
      s""""${k.replace("\"", "\\\"")}": "${v.replace("\"", "\\\"")}""""
    }.mkString("{", ", ", "}")

  /** GET /api/resources-exceptions */
  def resourcesExceptions(): DataFrame = resourcesExceptionsDf

  /** POST /api/resources-exceptions — the resource must exist in the catalog
    * and must not already have an exception (UniqueViolation → 400). */
  def createResourceException(resourceId: String,
      tableIndexes: Map[String, String] = Map.empty,
      comment: Option[String] = None,
      authorization: Option[String] = None,
      columnProfile: Option[Map[String, graft.model.ColumnInfo]] = None): Unit = {
    authorize(authorization)
    require(resource(resourceId).count() > 0, "Resource not found")
    validateIndexes(tableIndexes)
    columnProfile.foreach(validateIndexesAgainstProfile(tableIndexes, _))
    val existing = resourcesExceptionsDf
    require(existing.isEmpty ||
      existing.filter(col("resource_id") === resourceId).isEmpty,
      "Resource exception already exists")
    import spark.implicits._
    store.upsert("resources_exceptions",
      Seq((resourceId, indexesJson(tableIndexes), comment.orNull))
        .toDF("resource_id", "table_indexes", "comment"),
      "resource_id")
  }

  /** PUT /api/resources-exceptions/{id}. Returns false when the resource is
    * unknown (404). */
  def updateResourceException(resourceId: String,
      tableIndexes: Map[String, String] = Map.empty,
      comment: Option[String] = None,
      authorization: Option[String] = None,
      columnProfile: Option[Map[String, graft.model.ColumnInfo]] = None): Boolean = {
    authorize(authorization)
    if (resource(resourceId).isEmpty) return false
    validateIndexes(tableIndexes)
    columnProfile.foreach(validateIndexesAgainstProfile(tableIndexes, _))
    import spark.implicits._
    store.upsert("resources_exceptions",
      Seq((resourceId, indexesJson(tableIndexes), comment.orNull))
        .toDF("resource_id", "table_indexes", "comment"),
      "resource_id")
    true
  }

  /** DELETE /api/resources-exceptions/{id}. Returns false when the resource
    * is unknown (404). */
  def deleteResourceException(resourceId: String,
      authorization: Option[String] = None): Boolean = {
    authorize(authorization)
    if (resource(resourceId).isEmpty) return false
    store.load("resources_exceptions").foreach { df =>
      store.save("resources_exceptions", df.filter(col("resource_id") =!= resourceId))
    }
    true
  }
}
