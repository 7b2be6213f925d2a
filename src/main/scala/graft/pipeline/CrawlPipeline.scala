package graft.pipeline

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ingest.CsvIngest
import graft.model.ResourceStatus
import graft.store.MetaStore

/** E1/E2/E5/E7 — the crawl → check → analyse → ingest orchestration
  * (reference crawl/__init__.py:14-41, analysis/resource.py:35-133,
  * analysis/csv.py:108-199), collapsed into one Spark driver loop with
  * pluggable I/O ports.
  *
  * Network and webhook I/O live behind `Fetcher`/`Notifier` traits (zero
  * egress here: the default Fetcher serves local files). Everything that
  * touches data — ingest, profiling, metadata upserts — is executor-side
  * Spark work from CsvIngest/MetaStore. */
object CrawlPipeline {

  /** A2/E2 port: "download" a url. Local deployment maps file: urls. */
  trait Fetcher {
    /** Returns (localPath, headers) or an error string. */
    def fetch(url: String): Either[String, (String, Map[String, String])]
  }

  /** File-serving fetcher (zero-egress stand-in for the HTTP client). */
  final class LocalFetcher extends Fetcher {
    def fetch(url: String): Either[String, (String, Map[String, String])] = {
      val path = url.stripPrefix("file://")
      if (Files.exists(Paths.get(path)))
        Right((path, Map(
          "content-length" -> Files.size(Paths.get(path)).toString,
          "content-type" -> "text/csv")))
      else Left(s"not found: $url")
    }
  }

  /** C8 port: "check:" / "analysis:" webhooks (crawl/preprocess_check_data.py:36-55). */
  trait Notifier {
    def notify(datasetId: String, resourceId: String, document: Map[String, Any]): Unit
  }
  final class NoopNotifier extends Notifier {
    val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String, Map[String, Any])]
    def notify(d: String, r: String, doc: Map[String, Any]): Unit = sent += ((d, r, doc))
  }

  final case class CheckOutcome(
      resourceId: String,
      url: String,
      status: Int,
      checksum: Option[String],
      filesize: Option[Long],
      parsingTable: Option[String],
      error: Option[String],
      changed: Boolean)

  /** B7: streamed sha1 of a local file (utils/file.py:16-24). */
  def sha1File(path: String): String = {
    val md = MessageDigest.getInstance("SHA-1")
    val in = Files.newInputStream(Paths.get(path))
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** One crawl batch, end-to-end:
    * select due resources (A7) → "check" each via the Fetcher (E2) → change
    * detection against the last check (E4) → CSV analysis + ingest when
    * changed/first (E7) → append checks, update catalog, schedule next
    * check (E6). Returns the per-resource outcomes. */
  def runBatch(
      spark: SparkSession,
      store: MetaStore,
      warehouse: String,
      fetcher: Fetcher,
      notifier: Notifier,
      batchSize: Int = 40,
      now: Instant = Instant.now()): Seq[CheckOutcome] = {

    import graft.queries.ChecksQueries
    graft.functions.GraftFunctions.register(spark)

    val catalog = store.load("catalog").getOrElse(return Seq.empty)
    val checks = store.load("checks")

    val batch = ChecksQueries.selectBatch(catalog, batchSize, Timestamp.from(now))
      .select("resource_id", "dataset_id", "url").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))

    // A7 claim step (crawl/select_batch.py:16-31): mark picked rows
    // CRAWLING_URL so a concurrent selector skips them; reset to NULL in
    // the final upsert below (update-NULL-wins semantics)
    import spark.implicits._
    if (batch.nonEmpty) {
      store.upsert("catalog",
        batch.map(b => (b._1, ResourceStatus.CrawlingUrl)).toSeq
          .toDF("resource_id", "status"),
        "resource_id")
    }

    // only the BATCH's resources come back to the driver (bounded by
    // batchSize), never the full check history — the isin filter pushes to
    // the partitioned parquet scan before the window
    val batchIds = batch.map(_._1).toSeq
    val lastByResource: Map[String, (Option[String], Long)] = checks match {
      case None => Map.empty
      case Some(df) =>
        ChecksQueries.dedupLatestPerResource(
          df.filter(col("resource_id").isin(batchIds: _*)))
          .select("resource_id", "checksum", "id").collect()
          .map(r => r.getString(0) -> (Option(r.getString(1)), r.getLong(2))).toMap
    }
    val maxCheckId = checks.map(_.agg(max("id")).head().getLong(0)).getOrElse(0L)
    // resources_exceptions: size-cap waiver + requested table_indexes
    // (C1/D15 — "indexes" recorded in tables_index like the reference's
    // jsonb column; index name scheme = HeaderUtils.indexName)
    val exceptionRows: Map[String, String] = store.load("resources_exceptions")
      .map { df =>
        val hasIdx = df.columns.contains("table_indexes")
        df.collect().map { r =>
          r.getAs[String]("resource_id") ->
            (if (hasIdx) Option(r.getAs[String]("table_indexes")).getOrElse("") else "")
        }.toMap
      }
      .getOrElse(Map.empty)
    val exceptions: Set[String] = exceptionRows.keySet
    val newIndexEntries = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, String, String)]

    val outcomes = batch.zipWithIndex.map { case ((resourceId, datasetId, url), i) =>
      fetcher.fetch(url) match {
        case Left(err) =>
          notifier.notify(datasetId, resourceId, Map("check:available" -> false, "check:error" -> err))
          CheckOutcome(resourceId, url, 404, None, None, None, Some(err), changed = false)
        case Right((path, headers)) =>
          val checksum = sha1File(path)
          val size = Files.size(Paths.get(path))
          val (_, format) = HeaderUtils.detectTabularFromHeaders(headers, url)
          val last = lastByResource.get(resourceId)
          val changed = last.forall(!_._1.contains(checksum)) // first check or checksum diff (E4 tail)
          if (!HeaderUtils.sizeAllowed(format, size, exceptions.contains(resourceId))) {
            // size-cap refusal (utils/file.py:48-65 abort; waived for exceptions)
            CheckOutcome(resourceId, url, 200, Some(checksum), Some(size), None,
              Some("File too large to download"), changed)
          } else {
          val parsingTable =
            if (changed) {
              try {
                val res =
                  if (format == "xlsx" || url.endsWith(".xlsx"))
                    CsvIngest.analyseXlsx(spark, path, url, warehouse)
                  else CsvIngest.analyseCsv(spark, path, url, warehouse)
                // C6: record the parsed table + full inspection report +
                // any requested indexes from the exceptions table
                newIndexEntries += ((res.tableName,
                  graft.model.InspectionJson.toJson(res.inspection), resourceId, url,
                  exceptionRows.getOrElse(resourceId, "")))
                notifier.notify(datasetId, resourceId, Map(
                  "analysis:checksum" -> checksum,
                  "analysis:content-length" -> size,
                  "analysis:parsing-table" -> res.tableName))
                Some(res.tableName)
              } catch {
                case e: CsvSnifferException => None
              }
            } else None
          CheckOutcome(resourceId, url, 200, Some(checksum), Some(size), parsingTable, None, changed)
          }
      }
    }.toSeq

    // append the new check rows (D-partition-friendly schema) in one write
    val createdAt = Timestamp.from(now)
    val newChecks = outcomes.zipWithIndex.map { case (o, i) =>
      (maxCheckId + i + 1, o.resourceId, o.url, domainOf(o.url), createdAt,
        o.status, o.checksum, o.filesize, o.parsingTable, o.error,
        Timestamp.from(Scheduling.calculateNextCheck(o.changed, Some(now), None, now)))
    }.toDF("id", "resource_id", "url", "domain", "created_at",
      "status", "checksum", "filesize", "parsing_table", "error", "next_check_at")
    // date-partitioned append: retention purges (D14) and backoff windows
    // (D7) then prune partitions instead of scanning the whole log
    store.append("checks",
      newChecks.withColumn("created_date", to_date(col("created_at"))),
      partitionBy = Seq("created_date"))

    // C6: tables_index append — one row per freshly parsed table
    if (newIndexEntries.nonEmpty) {
      val idx = newIndexEntries.toSeq
        .toDF("parsing_table", "csv_detective", "resource_id", "url", "indexes")
        .withColumn("created_at", lit(createdAt))
      store.append("tables_index", idx)
    }

    // catalog: point each resource at its new check, clear status (E3's
    // "reset so it's not forbidden to be checked again" — an explicit NULL
    // that the upsert's DO-UPDATE semantics preserves) and priority
    val updates = newChecks
      .select(col("resource_id"), col("id").as("last_check"), col("next_check_at"))
      .withColumn("priority", lit(false))
      .withColumn("status", lit(null).cast("string"))
    store.upsert("catalog", updates, "resource_id")

    outcomes
  }

  type CsvSnifferException = graft.detect.CsvSniffer.ParseException

  def domainOf(url: String): String =
    try Option(new java.net.URI(url).getHost).getOrElse("local")
    catch { case _: Exception => "local" }

  /** E1 — the crawl loop (crawl/__init__.py:14-41): run batches until no
    * work remains or maxBatches is reached. sleepMs mirrors
    * SLEEP_BETWEEN_BATCHES (0 in tests). */
  def runLoop(
      spark: SparkSession,
      store: MetaStore,
      warehouse: String,
      fetcher: Fetcher,
      notifier: Notifier,
      batchSize: Int = 40,
      maxBatches: Int = 10,
      sleepMs: Long = 0L,
      now: () => Instant = () => Instant.now()): Seq[Seq[CheckOutcome]] = {
    val all = Seq.newBuilder[Seq[CheckOutcome]]
    var i = 0
    var done = false
    while (i < maxBatches && !done) {
      val outcomes = runBatch(spark, store, warehouse, fetcher, notifier, batchSize, now())
      all += outcomes
      done = outcomes.isEmpty
      if (!done && sleepMs > 0) Thread.sleep(sleepMs)
      i += 1
    }
    all.result()
  }
}
