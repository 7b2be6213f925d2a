package graft.queries

import graft.SparkSpec

class GraftCatalogSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pure-SQL session: tables and kernels drive from spark.sql text") {
    GraftCatalog.register(spark, dir)

    // relational SQL over the views, including the NANOS-truncated events
    val joined = spark.sql(
      """SELECT n_name, count(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3""".stripMargin).collect()
    assert(joined.length == 3 && joined.forall(_.getLong(1) > 0))
    val ev = spark.sql(
      "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01'").head.getLong(0)
    assert(ev > 0)

    // kernel functions callable straight from SQL text
    val scored = spark.sql(
      """SELECT doc_id, graft_quality_score(text) AS q, graft_lang_id(text, 5) AS lang
        |FROM documents WHERE graft_quality_score(text) IS NOT NULL
        |ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(scored.length == 5)

    // re-register is idempotent
    GraftCatalog.register(spark, dir)
    assert(spark.sql("SELECT count(*) FROM documents").head.getLong(0) > 0)
  }
}
