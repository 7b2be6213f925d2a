package graft.queries

import org.apache.spark.sql.functions._

/** Flagship analytical queries + LLM-training-data text operators over the
  * `documents` table (SURVEY scope note: dedup / text analysis are first-class
  * beyond the reference's own surface). All single-shuffle shapes. */
object PipelineQueries {

  import NamedQuery.sql

  def all: Map[String, NamedQuery] = Map(

    // Flagship: TPC-H Q1-shaped scan+hash-agg over lineitem. Partial/final agg,
    // only 7 columns read (check ReadSchema), rounds pin down fp drift.
    "q01_lineitem_agg" -> sql(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg("l_quantity"), 2).as("avg_qty"),
            round(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // Exact dedup by content (SURVEY §7.8): group on the text, keep first id +
    // multiplicity, emit a stable md5 content hash. One shuffle on the hash.
    "x01_dedup_exact" -> sql(
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy("text")
          .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_dups"))
          .select(col("doc_id"), md5(col("text")).as("text_hash"), col("n_dups"))
          .orderBy("doc_id"),
      """SELECT min(doc_id) AS doc_id, md5(text) AS text_hash, count(*) AS n_dups
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin),

    // Token counting (whitespace tokenizer) — narrow, no shuffle.
    "x02_token_count" -> sql(
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("n_tokens"),
            col("n_chars"))
          .orderBy("doc_id"),
      """SELECT doc_id, CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Quality scoring: stopword ratio + chars-per-token, pure column math.
    "x03_quality_score" -> sql(
      (s, dir) => {
        val tokens = size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("double")
        val stop = size(expr("filter(split(text, ' '), x -> x IN ('the', 'a'))")).cast("double")
        Tables.documents(s, dir)
          .select(col("doc_id"),
            round(stop / tokens, 4).as("stopword_ratio"),
            round(col("n_chars") / tokens, 4).as("chars_per_token"))
          .orderBy("doc_id")
      },
      """SELECT doc_id,
        |  round(CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS DOUBLE)
        |        / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 4) AS stopword_ratio,
        |  round(CAST(n_chars AS DOUBLE)
        |        / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 4) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Document fingerprinting: whitespace-normalized lowercase md5.
    "x04_fingerprint" -> sql(
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
          .orderBy("doc_id"),
      """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Per-language corpus stats: groupBy + multi-agg (profile shape, §2-D note).
    "x05_lang_stats" -> sql(
      (s, dir) =>
        Tables.documents(s, dir)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg("n_chars"), 2).as("avg_chars"),
            min("n_chars").as("min_chars"),
            max("n_chars").as("max_chars"),
            count_distinct(col("source")).as("n_sources"))
          .orderBy("lang"),
      """SELECT lang, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
  )
}
