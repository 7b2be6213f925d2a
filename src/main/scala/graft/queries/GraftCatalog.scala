package graft.queries

import org.apache.spark.sql.SparkSession

/** SQL-first entry point: register every test-data table as a temp view and
  * the graft kernel functions on the session, so the whole engine drives
  * from `spark.sql(...)` — the interface a SQL-native user of the reference
  * service would reach for first. The views are plain parquet scans (all
  * Catalyst pushdown/pruning applies); the kernels
  * (graft_quality_score, graft_lang_id, graft_minhash_bands, graft_cosine,
  * ...) become callable directly from SQL text.
  *
  * Idempotent and session-scoped, like GraftFunctions.register. */
object GraftCatalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register all tables of `dir` as temp views plus the kernel functions.
    * `events` goes through the TIMESTAMP(NANOS) truncation in Tables, so
    * SQL over the view agrees with the DuckDB oracles' epoch_us(). */
  def register(spark: SparkSession, dir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    Seq(
      "region" -> Tables.region(spark, dir),
      "nation" -> Tables.nation(spark, dir),
      "customer" -> Tables.customer(spark, dir),
      "supplier" -> Tables.supplier(spark, dir),
      "part" -> Tables.part(spark, dir),
      "orders" -> Tables.orders(spark, dir),
      "lineitem" -> Tables.lineitem(spark, dir),
      "events" -> Tables.events(spark, dir),
      "documents" -> Tables.documents(spark, dir),
      "embeddings" -> Tables.embeddings(spark, dir)
    ).foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }
}
