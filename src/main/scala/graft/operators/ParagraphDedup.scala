package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide paragraph-level deduplication — the middle granularity of the
  * published web-corpus recipes (RefinedWeb / Dolma run exact dedup at the
  * document, paragraph, AND line level; graft's Dedup covers documents and
  * LineDedup covers high-document-frequency lines). A paragraph that appears
  * anywhere else in the corpus is kept only at its FIRST occurrence — the
  * smallest (doc, position) — and removed everywhere else; documents are
  * rewritten, not dropped.
  *
  * Scale shape (and the reason this is not LineDedup with a bigger
  * separator): the keep-first decision needs a global argmin per paragraph,
  * and the naive formulation — window over the exploded text partitioned by
  * paragraph — shuffles every paragraph's TEXT by content hash and then
  * again by document for reassembly. Here text shuffles exactly once:
  *   1. narrow projection to (id, pos, xxhash64(paragraph)) — 24-byte rows;
  *   2. argmin per hash via min(struct(id, pos)) — map-side-combining agg
  *      over 24-byte rows;
  *   3. losers (every occurrence ≠ argmin) aggregated to one
  *      (id, array<pos>) row per affected document — still id-sized;
  *   4. ONE join of the ORIGINAL frame against the loser positions keyed on
  *      id, then a pure position-filtering projection rebuilds the text.
  * At 100 TB steps 1–3 move only ids and hashes; the single text exchange
  * in step 4 is the unavoidable one (and vanishes entirely for documents
  * with no duplicated paragraph via the left join's null arm).
  */
object ParagraphDedup {

  private val reserved = Seq("__pos", "__ph", "__win", "__drops")

  /** Rewrite each document keeping only first occurrences of each distinct
    * (trimmed) paragraph. Returns the input columns plus
    * (cleaned_text, n_paras_kept, n_paras_dropped); paragraph identity is
    * the trimmed text (keyed by xxhash64 — a 64-bit collision would drop a
    * non-duplicate, odds ~ n²/2⁶⁵), and the rebuilt text joins trimmed
    * paragraphs with `sep`. Zero-length trimmed segments (consecutive,
    * leading, or trailing separators) are separator ARTIFACTS, not
    * paragraphs: they are excluded from dedup, from both n_paras_* counts,
    * and from the rebuilt text — otherwise every blank segment corpus-wide
    * would collide on one hash and unrelated documents would trade
    * "duplicate" blanks. A document whose every paragraph lost comes
    * back with empty text — the caller's min-length gate decides its fate. */
  def keepFirstParagraphs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      sep: String = "\n\n"): DataFrame = {
    reserved.foreach(r => require(!df.columns.contains(r),
      s"ParagraphDedup reserves helper column name $r"))
    val paras: Column = filter(
      transform(
        split(col(textCol), java.util.regex.Pattern.quote(sep)), p => trim(p)),
      p => length(p) > 0)

    // (id, pos, hash) — text never leaves this projection.
    val occ = df
      .select(col(idCol), posexplode(paras))
      .select(col(idCol), col("pos").as("__pos"), xxhash64(col("col")).as("__ph"))

    // First occurrence per paragraph = lexicographic min of (id, pos).
    val winners = occ
      .groupBy("__ph")
      .agg(min(struct(col(idCol), col("__pos"))).as("__win"))

    // Dropped positions per document (only documents that lose something).
    val loserPos = occ
      .join(winners, Seq("__ph"))
      .where(col("__win") =!= struct(col(idCol), col("__pos")))
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("__pos"))).as("__drops"))

    df.join(loserPos, Seq(idCol), "left")
      .withColumn("__drops",
        coalesce(col("__drops"), array().cast("array<int>")))
      .select(
        df.columns.map(col) ++ Seq[Column](
          concat_ws(sep,
            filter(paras, (_, i) => !array_contains(col("__drops"), i)))
            .as("cleaned_text"),
          (size(paras) - size(col("__drops"))).cast("long").as("n_paras_kept"),
          size(col("__drops")).cast("long").as("n_paras_dropped")): _*)
  }
}
