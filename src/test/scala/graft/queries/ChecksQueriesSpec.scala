package graft.queries

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChecksQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val catalog = Seq(
    // resource_id, dataset_id, url, deleted, last_check, priority, status, next_check_at
    ("r1", "d1", "http://a.fr/1.csv", false, Some(11L), false, None: Option[String], Some(ts("2024-05-01 00:00:00"))),
    ("r2", "d1", "http://a.fr/2.csv", false, None: Option[Long], true, None, None),
    ("r3", "d2", "http://b.fr/3.csv", false, Some(31L), false, None, Some(ts("2024-07-01 00:00:00"))),
    ("r4", "d2", "http://excluded.fr/x.csv", false, None: Option[Long], false, None, None),
    ("r5", "d3", "http://a.fr/5.csv", true, None: Option[Long], false, None, None)
  ).toDF("resource_id", "dataset_id", "url", "deleted", "last_check", "priority", "status", "next_check_at")

  private lazy val checks = Seq(
    (11L, "r1", "http://a.fr/1.csv", "a.fr", ts("2024-06-01 10:00:00"), Some(200), false),
    (10L, "r1", "http://a.fr/1.csv", "a.fr", ts("2024-06-01 09:00:00"), Some(500), false),
    (9L,  "r1", "http://a.fr/1.csv", "a.fr", ts("2024-06-01 08:00:00"), Some(200), false),
    (31L, "r3", "http://b.fr/3.csv", "b.fr", ts("2024-06-01 10:30:00"), None, true)
  ).toDF("id", "resource_id", "url", "domain", "created_at", "status", "timeout")

  test("latestCheck joins the pointed-at check row") {
    val row = ChecksQueries.latestCheck(catalog, checks, col("resource_id") === "r1").head()
    assert(row.getAs[Long]("id") == 11L && row.getAs[Int]("status") == 200)
  }

  test("allChecks newest first") {
    val ids = ChecksQueries.allChecks(checks, col("resource_id") === "r1")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(11L, 10L, 9L))
  }

  test("aggregateByColumn groups one day's checks top-k") {
    val agg = ChecksQueries.aggregateByColumn(checks, "domain", Date.valueOf("2024-06-01"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(agg == Seq("a.fr" -> 3L, "b.fr" -> 1L))
  }

  test("crawlerStatus counts never-checked and due") {
    val r = ChecksQueries.crawlerStatus(catalog, ts("2024-06-01 00:00:00")).head()
    assert(r.getAs[Long]("total") == 4L)        // r5 deleted
    assert(r.getAs[Long]("never_checked") == 2L) // r2, r4
    assert(r.getAs[Long]("due") == 1L)           // r1 (05-01 <= 06-01)
  }

  test("stats buckets latest checks with percentages") {
    val rows = ChecksQueries.stats(checks).collect()
      .map(r => (r.getString(0), r.getAs[Long]("count"), r.getAs[Double]("percentage"))).toSeq
    // latest per resource: r1→200 ok, r3→timeout
    assert(rows.map(t => (t._1, t._2)).toSet == Set(("ok", 1L), ("timeout", 1L)))
    assert(rows.forall(_._3 == 50.0))
  }

  test("lastTwoChecks window per resource") {
    val ids = ChecksQueries.lastTwoChecks(checks)
      .filter(col("resource_id") === "r1").select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(11L, 10L))
  }

  test("selectBatch honors priority > never-checked > due, exclusions, size") {
    val batch = ChecksQueries.selectBatch(
      catalog, batchSize = 2, now = ts("2024-06-01 00:00:00"),
      excludedUrlPatterns = Seq("%excluded%"))
      .select("resource_id").collect().map(_.getString(0)).toSeq
    assert(batch.length == 2)
    assert(batch.contains("r2")) // priority row always first
    assert(!batch.contains("r4") && !batch.contains("r5"))
  }

  test("csvSample: halves, exclusions, size cap from headers") {
    val cat = Seq(
      ("r1", "d1", "http://a.fr/1.csv", Some(1L)),
      ("r2", "d1", "http://static.data.gouv.fr/2.csv", Some(2L)),
      ("r3", "d2", "http://a.fr/explore/dataset/x", Some(3L)),   // ODS pattern
      ("r4", "d2", "http://a.fr/4.csv", Some(4L)),               // too big
      ("r5", "d3", "http://a.fr/5.json", Some(5L)),              // not csv
      ("r6", "d3", "http://a.fr/6.csv", Some(6L))                // bad status
    ).toDF("resource_id", "dataset_id", "url", "last_check")
    val chk = Seq(
      (1L, "http://a.fr/1.csv", "a.fr", 200, Map("content-type" -> "text/csv", "content-length" -> "100")),
      (2L, "http://static.data.gouv.fr/2.csv", "static.data.gouv.fr", 200, Map("content-type" -> "application/csv", "content-length" -> "50")),
      (3L, "http://a.fr/explore/dataset/x", "a.fr", 200, Map("content-type" -> "text/csv", "content-length" -> "10")),
      (4L, "http://a.fr/4.csv", "a.fr", 200, Map("content-type" -> "text/csv", "content-length" -> "99999999999")),
      (5L, "http://a.fr/5.json", "a.fr", 200, Map("content-type" -> "application/json", "content-length" -> "10")),
      (6L, "http://a.fr/6.csv", "a.fr", 500, Map("content-type" -> "text/csv", "content-length" -> "10"))
    ).toDF("id", "url", "domain", "status", "headers")
    val got = ChecksQueries.csvSample(cat, chk, size = 10)
      .select("resource_id").collect().map(_.getString(0)).toSet
    assert(got == Set("r1", "r2"), got.toString)
  }
}
