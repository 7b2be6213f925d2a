package graft

import org.apache.spark.sql.SparkSession

/** Input-schema fingerprinting for the bench artifact.
  *
  * Round 5's bench crashed (rc=1) because the testdata's events.parquet
  * silently changed timestamp encoding between rounds — the committed
  * BENCH_local.json went stale with nothing in the artifact to show why.
  * The guard makes data-shape drift VISIBLE and LOUD: every bench run
  * records the raw parquet schema of each input table in the emitted JSON,
  * and at startup compares the live testdata against the fingerprints in
  * the last committed artifact. A mismatch aborts before any query runs
  * (rc=3) with a per-table diff — a schema-drift failure reads as exactly
  * that, not as nine unrelated query errors.
  *
  * Fingerprints are the RAW footer schema (no loader normalization): the
  * repair in Tables.events must not mask the drift signal.
  */
object BenchGuard {
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** `name:type` CSV per table present under `dir`. A table whose footer
    * Spark cannot even resolve (e.g. TIMESTAMP(NANOS) without the legacy
    * flag) fingerprints as `unreadable:<exception class>` — still a stable,
    * comparable value. */
  def fingerprint(spark: SparkSession, dir: String): Map[String, String] =
    tables.flatMap { t =>
      val path = s"$dir/$t.parquet"
      if (!new java.io.File(path).exists()) None
      else Some(t -> (
        try spark.read.parquet(path).schema.fields
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
        catch { case e: Throwable => s"unreadable:${e.getClass.getSimpleName}" }))
    }.toMap

  /** The `"schemas"` block of a previously written bench artifact, or None
    * when the file is absent/unparseable (first run, truncated artifact). */
  def recordedSchemas(artifactPath: String): Option[Map[String, String]] =
    try {
      val f = new java.io.File(artifactPath)
      if (!f.exists()) None
      else {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        JsonMethods.parse(f) \ "schemas" match {
          case JObject(fields) =>
            Some(fields.collect { case (k, JString(v)) => k -> v }.toMap)
          case _ => None
        }
      }
    } catch { case _: Throwable => None }

  /** Tables whose live fingerprint differs from the recorded one. Tables
    * only on one side are ignored — the guard is about silent RESHAPE of
    * shared inputs, not about adding a table. */
  def drift(
      recorded: Map[String, String],
      live: Map[String, String]): Seq[(String, String, String)] =
    recorded.keySet.intersect(live.keySet).toSeq.sorted.flatMap { t =>
      if (recorded(t) == live(t)) None else Some((t, recorded(t), live(t)))
    }

  /** JSON object text for the `"schemas"` field (keys sorted for stable
    * diffs across runs). */
  def schemasJson(fp: Map[String, String]): String =
    fp.toSeq.sorted
      .map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
}
