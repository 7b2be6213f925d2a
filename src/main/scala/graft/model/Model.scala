package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The engine's 7-type logical vocabulary (reference: csv-detective's
  * python_type output consumed at analysis/csv.py:63-81, utils/parquet.py:6-14).
  * We fix the reference's datetime→date64 quirk by mapping datetime to a true
  * TimestampType (SURVEY §1.2). */
sealed abstract class LogicalType(val name: String, val sparkType: DataType)

object LogicalType {
  case object LString   extends LogicalType("string", StringType)
  case object LInt      extends LogicalType("int", LongType)
  case object LFloat    extends LogicalType("float", DoubleType)
  case object LBool     extends LogicalType("bool", BooleanType)
  case object LJson     extends LogicalType("json", StringType) // raw JSON text
  case object LDate     extends LogicalType("date", DateType)
  case object LDatetime extends LogicalType("datetime", TimestampType)

  val all: Seq[LogicalType] = Seq(LString, LInt, LFloat, LBool, LJson, LDate, LDatetime)

  /** Unknown names default to string, mirroring analysis/csv.py:231. */
  def fromName(n: String): LogicalType = all.find(_.name == n).getOrElse(LString)
}

/** Per-column detection result (csv-detective report's columns entry). */
final case class ColumnInfo(pythonType: String, format: String = "default")

/** Per-column profile statistics (csv-detective output_profile=True shape,
  * asserted keys at tests/test_analysis/test_analysis_csv.py:84-86). */
final case class ColumnProfile(
    min: Option[Double],
    max: Option[Double],
    mean: Option[Double],
    std: Option[Double],
    tops: Seq[(String, Long)],
    nbDistinct: Long,
    nbMissingValues: Long)

/** Full inspection report for one file (SURVEY §1.1: the dict produced by
  * csv_detective_routine and consumed at analysis/csv.py:299-360). */
final case class Inspection(
    encoding: String,
    separator: String,
    headerRowIdx: Int,
    header: Seq[String],
    totalLines: Long,
    columns: Map[String, ColumnInfo],
    profile: Map[String, ColumnProfile] = Map.empty) {

  /** Spark schema under the 7-type vocabulary, in header order. */
  def schema: StructType =
    StructType(header.map { h =>
      StructField(h, LogicalType.fromName(
        columns.get(h).map(_.pythonType).getOrElse("string")).sparkType)
    })
}

/** catalog row (migrations/main/20221205_initial_up_rev1.sql:1-11 + later revs). */
final case class CatalogEntry(
    datasetId: String,
    resourceId: String,
    url: String,
    deleted: Boolean = false,
    lastCheck: Option[Long] = None,
    priority: Boolean = false,
    harvestModifiedAt: Option[Timestamp] = None,
    status: Option[String] = None)

/** checks row (append-only log; migrations 20221205 + parquet/next_check revs). */
final case class Check(
    id: Long,
    resourceId: String,
    url: String,
    domain: String,
    createdAt: Timestamp,
    status: Option[Int],
    headers: Map[String, String] = Map.empty,
    timeout: Boolean = false,
    responseTime: Option[Double] = None,
    error: Option[String] = None,
    checksum: Option[String] = None,
    filesize: Option[Long] = None,
    mimeType: Option[String] = None,
    detectedLastModifiedAt: Option[Timestamp] = None,
    parsingTable: Option[String] = None,
    parsingError: Option[String] = None,
    parquetUrl: Option[String] = None,
    parquetSize: Option[Long] = None,
    nextCheckAt: Option[Timestamp] = None)

/** tables_index row (migrations/csv/20221205_initial_up_rev1.sql:1-10). */
final case class TableIndexEntry(
    parsingTable: String,
    csvDetective: String, // full inspection report as JSON text
    resourceId: String,
    url: String,
    createdAt: Timestamp)

/** resources_exceptions row (migrations/main/20240827). */
final case class ResourceException(
    resourceId: String,
    tableIndexes: Map[String, String] = Map.empty,
    comment: Option[String] = None)

/** Resource status state machine (db/resource.py:9-19). */
object ResourceStatus {
  val ToCheck = "TO_CHECK"
  val CrawlingUrl = "CRAWLING_URL"
  val ToAnalyseResource = "TO_ANALYSE_RESOURCE"
  val AnalysingResource = "ANALYSING_RESOURCE"
  val ToAnalyseCsv = "TO_ANALYSE_CSV"
  val AnalysingCsv = "ANALYSING_CSV"
  val InsertingInDb = "INSERTING_IN_DB"
  val ConvertingToParquet = "CONVERTING_TO_PARQUET"

  /** Human-readable status explanations (Resource.STATUSES; None = idle).
    * "BACKOFF" is a valid stored status though not a machine constant. */
  val verbose: Map[Option[String], String] = Map(
    None -> "no status, waiting",
    Some("BACKOFF") -> "backoff period for this domain, will be checked later",
    Some(CrawlingUrl) -> "resource URL currently being crawled",
    Some(ToAnalyseResource) -> "resource to be processed for change, type and size analysis",
    Some(AnalysingResource) -> "currently being processed for change, type and size analysis",
    Some(ToAnalyseCsv) -> "resource content to be analysed by CSV detective",
    Some(AnalysingCsv) -> "resource content currently being analysed by CSV detective",
    Some(InsertingInDb) -> "currently being inserted in DB",
    Some(ConvertingToParquet) -> "currently being converted to Parquet")

  /** Statuses accepted by the insert/update write paths. */
  val valid: Set[String] = verbose.keys.flatten.toSet
}
