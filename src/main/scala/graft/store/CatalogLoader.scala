package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A6 — the national-catalog CSV loader, the reference's entry point for all
  * crawl state (cli.py:50-122).
  *
  * Semantics mirrored exactly:
  *   - `;`-separated, quoted, header row with dotted column names
  *     (tests/data/catalog.csv:1)
  *   - rows whose `dataset.archived` is not the literal "False" are skipped
  *     (an archived dataset's resources never enter the crawl)
  *   - before the upsert, every existing catalog row is soft-deleted; rows
  *     present in the new catalog resurrect (deleted=FALSE), so a resource
  *     that vanished from the export stays tombstoned
  *   - `harvest.modified_at` parses as UTC ("catalog data should be in UTC")
  *   - ON CONFLICT (resource_id) DO UPDATE touches ONLY dataset_id, url,
  *     deleted — an existing row keeps its harvest_modified_at, last_check,
  *     priority and status; new rows insert with priority=FALSE, status=NULL
  *
  * One narrow projection + one keyed merge — at any real catalog size this
  * is a broadcast-able upsert against the metadata store. */
object CatalogLoader {

  /** Parse the catalog CSV into upsert-ready rows (no store side effects). */
  def parseCatalog(spark: SparkSession, csvPath: String): DataFrame = {
    // the naive timestamp must mean UTC regardless of the session time zone
    // ("catalog data should be in UTC"): cast parses it as session-local,
    // from_utc_timestamp(_, sessionTz) adds the offset back so the wall time
    // becomes the UTC instant (a no-op when the session is UTC)
    val sessionTz = spark.conf.get("spark.sql.session.timeZone")
    spark.read
      .option("header", "true")
      .option("sep", ";")
      .option("quote", "\"")
      .csv(csvPath)
      .filter(col("`dataset.archived`") === "False")
      .select(
        col("`dataset.id`").as("dataset_id"),
        col("id").as("resource_id"),
        col("url"),
        when(col("`harvest.modified_at`").isNull ||
          trim(col("`harvest.modified_at`")) === "", lit(null).cast("timestamp"))
          .otherwise(from_utc_timestamp(col("`harvest.modified_at`").cast("timestamp"), sessionTz))
          .as("harvest_modified_at"),
        lit(false).as("deleted"),
        lit(false).as("priority"),
        lit(null).cast("string").as("status"),
        // crawl-state columns of the reference catalog DDL: inserts start
        // never-checked; upserts never touch these (onMatchUpdate)
        lit(null).cast("long").as("last_check"),
        lit(null).cast("timestamp").as("next_check_at"))
      .dropDuplicates("resource_id")
  }

  /** Full load_catalog: soft-delete everything, then upsert the export.
    * Returns the number of live rows loaded. */
  def loadCatalog(spark: SparkSession, store: MetaStore, csvPath: String): Long = {
    val rows = parseCatalog(spark, csvPath)
    // consider everything deleted; the upsert resurrects surviving rows
    store.softDeleteAll("catalog")
    val n = rows.count()
    store.upsert("catalog", rows, "resource_id",
      onMatchUpdate = Seq("dataset_id", "url", "deleted"))
    n
  }
}
