package graft.operators

import graft.SparkSpec

class TrainingDataPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("composed clean: quality gate → lang gate → exact dedup → near dedup → tokens") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup
      (3L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup
      (4L, "a completely different document with the usual words and a story about the sea"),
      (5L, "@@@ 111 222 $$$ ### 333 %%% +++"), // noise → quality gate
      (6L, "el gato está en la casa y no quiere salir por la puerta con el perro") // es → lang gate
    ).toDF("doc_id", "text")

    val (cleaned, report) = TrainingDataPipeline.clean(
      docs, minQuality = 0.4, keepLangs = Seq("en"), nearDupThreshold = 0.5)

    assert(report.input == 6L)
    assert(report.afterQuality == 5L)   // drops 5
    assert(report.afterLang == 4L)      // drops 6
    assert(report.afterExactDedup == 3L) // drops 2
    assert(report.afterNearDedup == 2L)  // drops 3 (near-dup of 1)
    val ids = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 4L))
    assert(report.totalTokens ==
      cleaned.agg(org.apache.spark.sql.functions.sum("__n_tokens")).head().getLong(0))
    assert(report.totalTokens > 20L)
    cleaned.unpersist()
  }

  test("report-only clean leaves no cached RDDs behind") {
    val docs = (1L to 50L).map(i =>
      (i, s"the document number $i talks about the weather and the sea and the sky"))
      .toDF("doc_id", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (_, report) = TrainingDataPipeline.clean(docs, minQuality = 0.1,
      nearDupThreshold = 0.5, retainResult = false)
    assert(report.input == 50L)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }
}

class GraftApiSpec extends SparkSpec {
  import spark.implicits._

  test("route-shaped calls over a populated store") {
    val store = new graft.store.MetaStore(spark,
      java.nio.file.Files.createTempDirectory("api").toString)
    store.save("catalog", Seq(
      ("r1", "u1", false, Some(10L)), ("r2", "u2", false, None: Option[Long])
    ).toDF("resource_id", "url", "deleted", "last_check"))
    store.save("checks", Seq(
      (10L, "r1", "u1", "a.fr", java.sql.Timestamp.valueOf("2024-06-01 10:00:00"), Some(200), false),
      (9L, "r1", "u1", "a.fr", java.sql.Timestamp.valueOf("2024-06-01 09:00:00"), Some(500), false)
    ).toDF("id", "resource_id", "url", "domain", "created_at", "status", "timeout"))

    val api = new graft.queries.GraftApi(spark, store)
    assert(api.checksLatest(resourceId = Some("r1")).head().getAs[Long]("id") == 10L)
    assert(api.checksAll(url = Some("u1")).count() == 2L)
    assert(api.checksAggregate("domain", java.sql.Date.valueOf("2024-06-01"))
      .head().getAs[Long]("count") == 2L)
    assert(api.resource("r2").count() == 1L)
    val h = api.health().head()
    assert(h.getBoolean(0) && h.getBoolean(1) && !h.getBoolean(2))
  }
}
