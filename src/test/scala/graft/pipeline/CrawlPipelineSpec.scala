package graft.pipeline

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.store.MetaStore

class CrawlPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("end-to-end batch: fetch → ingest → checks appended → catalog updated → re-crawl no-op") {
    val root = Files.createTempDirectory("crawl").toString
    val store = new MetaStore(spark, s"$root/meta")
    val warehouse = s"$root/warehouse"

    val csv1 = Files.createTempFile("r1", ".csv")
    Files.write(csv1, "id,v\n1,2\n2,3\n".getBytes)
    val csv2 = Files.createTempFile("r2", ".csv")
    Files.write(csv2, "a;b\nx;1\ny;2\nz;3\n".getBytes)

    store.save("catalog", Seq(
      ("r1", "d1", s"file://$csv1", false, None: Option[Long], false, None: Option[String], None: Option[java.sql.Timestamp]),
      ("r2", "d1", s"file://$csv2", false, None: Option[Long], false, None, None),
      ("r3", "d2", "file:///nope.csv", false, None: Option[Long], true, None, None)
    ).toDF("resource_id", "dataset_id", "url", "deleted", "last_check", "priority", "status", "next_check_at"))

    val notifier = new CrawlPipeline.NoopNotifier
    val now = Instant.parse("2024-06-01T00:00:00Z")
    val outcomes = CrawlPipeline.runBatch(spark, store, warehouse,
      new CrawlPipeline.LocalFetcher, notifier, batchSize = 10, now = now)

    assert(outcomes.length == 3)
    val byId = outcomes.map(o => o.resourceId -> o).toMap
    assert(byId("r1").changed && byId("r1").parsingTable.isDefined)
    assert(byId("r2").parsingTable.isDefined)
    assert(byId("r3").error.isDefined && byId("r3").status == 404)

    // parsed tables exist in the warehouse with typed columns
    val t1 = spark.read.parquet(s"$warehouse/${byId("r1").parsingTable.get}")
    assert(t1.count() == 2 && t1.schema("v").dataType.typeName == "long")

    // checks appended, catalog points at them, next_check scheduled
    val checks = store.load("checks").get
    assert(checks.count() == 3)
    val cat = store.load("catalog").get
    assert(cat.filter(col("resource_id") === "r1").head().getAs[Long]("last_check") > 0L)
    assert(cat.filter(col("last_check").isNull).count() == 0)

    // webhooks: analysis notification for both ingested resources + error for r3
    assert(notifier.sent.count(_._3.contains("analysis:parsing-table")) == 2)
    assert(notifier.sent.exists(_._3.get("check:available").contains(false)))

    // C6: tables_index rows carry the full inspection report as JSON
    val idx = store.load("tables_index").get
    assert(idx.count() == 2)
    val report = idx.filter(col("resource_id") === "r1").head().getAs[String]("csv_detective")
    for (key <- Seq("\"header\"", "\"columns\"", "\"total_lines\"", "\"profile\"", "\"formats\""))
      assert(report.contains(key), s"missing $key in $report")

    // E7/A7 state machine: statuses reset to NULL after the batch (the
    // CRAWLING_URL claim must not leak and block future selection)
    assert(cat.filter(col("status").isNotNull).count() == 0)

    // second crawl at a later due time: checksums unchanged → no re-ingest
    val outcomes2 = CrawlPipeline.runBatch(spark, store, warehouse,
      new CrawlPipeline.LocalFetcher, notifier, batchSize = 10,
      now = Instant.parse("2024-07-01T00:00:00Z"))
    val ok2 = outcomes2.filter(_.error.isEmpty)
    assert(ok2.nonEmpty && ok2.forall(o => !o.changed && o.parsingTable.isEmpty))
  }
}
