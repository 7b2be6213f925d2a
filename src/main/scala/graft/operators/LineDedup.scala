package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level line deduplication — the boilerplate-removal pass of the
  * C4/RefinedWeb recipes: a line that appears in many DOCUMENTS is
  * navigation chrome, cookie banners, or template text, and is removed
  * from every document (the documents are REWRITTEN, not dropped —
  * distinct from the whole-document dedup family in Dedup).
  *
  * Scale shape: explode lines (narrow) → document-frequency aggregation
  * keyed on xxhash64(line) so the count shuffle moves 8-byte longs, never
  * line text → hash-keyed anti-join flag → reassemble per document in
  * original line order. Frequency counts are per DISTINCT document: a line
  * repeated inside one document is repetition (x20's job), not boilerplate.
  */
object LineDedup {

  /** Rewrite each document with lines of corpus document-frequency
    * ≥ minDocFrequency removed. Returns
    * (doc_id, cleaned_text, n_lines_kept, n_lines_dropped); a document
    * whose every line is boilerplate comes back with empty text, not
    * dropped — the caller decides its fate (e.g. a min-length gate).
    * Lines are matched after trim; empty lines shared across documents
    * are boilerplate by this definition and get removed like any other. */
  def dropCommonLines(
      df: DataFrame,
      textCol: String,
      idCol: String,
      sep: String = "\n",
      minDocFrequency: Long = 2): DataFrame = {
    require(minDocFrequency >= 2, "minDocFrequency < 2 would drop every line")
    val lines = df
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))))
      .select(col(idCol), col("pos").as("__pos"), trim(col("col")).as("__line"))
      .withColumn("__lh", xxhash64(col("__line")))

    val boilerplate = lines
      .groupBy("__lh").agg(count_distinct(col(idCol)).as("__df"))
      .where(col("__df") >= minDocFrequency)
      .select(col("__lh"), lit(true).as("__drop"))

    lines
      .join(boilerplate, Seq("__lh"), "left")
      .groupBy(idCol)
      .agg(
        // kept lines, original order: nulls (dropped lines) vanish from
        // collect_list; struct sort restores pos order
        concat_ws(sep,
          transform(
            array_sort(collect_list(
              when(col("__drop").isNull, struct(col("__pos"), col("__line"))))),
            s => s.getField("__line"))).as("cleaned_text"),
        count(when(col("__drop").isNull, 1)).as("n_lines_kept"),
        count(when(col("__drop"), 1)).as("n_lines_dropped"))
  }
}
