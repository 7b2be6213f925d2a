package graft.pipeline

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.{CatalogLoader, MetaStore}

/** End-to-end parity on the REFERENCE'S OWN fixtures
  * (/root/reference/tests/data/): catalog CSV → loadCatalog → crawl →
  * CSV analysis → parsed table + checks + tables_index, mirroring
  * tests/test_analysis/test_analysis_csv.py:42-86 at available-fixture
  * scale. The reference's 45,522-row annuaire canary file is not shipped
  * offline — only the 31-row gz sample is — so the row-count pins differ,
  * but every structural assertion (md5 table name, inspection keys,
  * total_lines, status reset) is the reference test's, verbatim.
  */
class CanaryParitySpec extends SparkSpec {

  private val fixtures = "/root/reference/tests/data"
  private val resourceId = "c4e3a9fb-4415-488e-ba57-d05269b27adf"

  test("loadCatalog on the reference catalog.csv: archived skipped, UTC harvest ts") {
    val root = Files.createTempDirectory("canary-cat").toString
    val store = new MetaStore(spark, s"$root/meta")

    // catalog.csv: 2 rows, only the first has dataset.archived == "False"
    val n = CatalogLoader.loadCatalog(spark, store, s"$fixtures/catalog.csv")
    assert(n == 1L, s"live rows loaded: $n")
    val cat = store.load("catalog").get.collect()
    assert(cat.length == 1)
    val row = cat.head
    assert(row.getAs[String]("resource_id") == resourceId)
    assert(row.getAs[String]("dataset_id") == "601ddcfc85a59c3a45c2435a")
    assert(row.getAs[String]("url") == "https://example.com/resource-1")
    assert(!row.getAs[Boolean]("deleted") && !row.getAs[Boolean]("priority"))
    assert(row.getAs[String]("status") == null)

    // harvested variant in a fresh store: harvest.modified_at lands as UTC
    val store2 = new MetaStore(spark, s"$root/meta2")
    CatalogLoader.loadCatalog(spark, store2, s"$fixtures/catalog_harvested.csv")
    val harvested = store2.load("catalog").get
      .filter(col("resource_id") === resourceId).head()
    val ts = harvested.getAs[java.sql.Timestamp]("harvest_modified_at")
    assert(ts != null && ts.toInstant == Instant.parse("2022-12-06T05:00:32.647Z"),
      s"harvest_modified_at: $ts")

    // a reload resurrects: soft-delete-all + upsert keeps exactly the rows
    // the new export still carries (cli.py:88 semantics, d11's oracle shape)
    CatalogLoader.loadCatalog(spark, store, s"$fixtures/catalog.csv")
    val reloaded = store.load("catalog").get.collect()
    assert(reloaded.length == 1 && !reloaded.head.getAs[Boolean]("deleted"))
  }

  test("canary: crawl + analyse the annuaire gz through the full loop") {
    val root = Files.createTempDirectory("canary-e2e").toString
    val store = new MetaStore(spark, s"$root/meta")
    val warehouse = s"$root/warehouse"

    CatalogLoader.loadCatalog(spark, store, s"$fixtures/catalog.csv")
    // the reference test serves the fixture body at the resource url via
    // rmock; the offline analog points the resource at the fixture file
    val gz = s"$fixtures/20190618-annuaire-diagnostiqueurs_compressed.csv.gz"
    val url = s"file://$gz"
    import spark.implicits._
    store.upsert("catalog",
      Seq((resourceId, url)).toDF("resource_id", "url"), "resource_id")

    val outcomes = CrawlPipeline.runBatch(spark, store, warehouse,
      new CrawlPipeline.LocalFetcher, new CrawlPipeline.NoopNotifier,
      batchSize = 10, now = Instant.parse("2024-06-01T00:00:00Z"))
    assert(outcomes.length == 1)
    val o = outcomes.head
    assert(o.error.isEmpty, o.error.toString)

    // parsing_table == md5(url) — test_analysis_csv.py:28
    val expectedTable = java.security.MessageDigest.getInstance("MD5")
      .digest(url.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(o.parsingTable.contains(expectedTable), o.parsingTable.toString)

    // gz by magic bytes → 29 data rows (the shipped sample of the
    // 45,522-row canary; its 2 trailing blank/CR lines are skipped exactly
    // like the reference's `if line:`), 15 columns incl. accented headers
    val table = spark.read.parquet(s"$warehouse/$expectedTable")
    assert(table.count() == 29L)
    assert(table.columns.length >= 15, table.columns.mkString(","))

    // checks row: parsing_error null, table recorded
    val check = store.load("checks").get
      .filter(col("resource_id") === resourceId).head()
    assert(check.getAs[String]("parsing_table") == expectedTable)
    assert(check.getAs[String]("parsing_error") == null)

    // tables_index csv_detective report — test_analysis_csv.py:79-86
    val report = store.load("tables_index").get
      .filter(col("resource_id") === resourceId).head()
      .getAs[String]("csv_detective")
    for (key <- Seq("\"header\"", "\"columns\"", "\"formats\"", "\"profile\""))
      assert(report.contains(key), s"missing $key")
    assert(report.contains("\"total_lines\":29"), report.take(200))
    // the sample's typing survives the whole loop: CP/Tel1 int, dates typed
    assert(report.contains("\"CP\":{\"python_type\":\"int\""))
    assert(report.contains("\"Date début validité\":{\"python_type\":\"date\""))

    // resource status is back to NULL after analysis — the claim must not leak
    val cat = store.load("catalog").get.filter(col("resource_id") === resourceId).head()
    assert(cat.getAs[String]("status") == null)
  }
}
