package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring detection — the "exact substring dedup" pass of
  * Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
  * Better"), re-expressed for Spark. The paper builds a corpus-wide suffix
  * array and drops any ≥50-token span that appears twice; a distributed
  * suffix array is a poor fit for a shuffle-based engine, so graft uses the
  * standard windowed equivalent: slide a w-token window over every document,
  * count corpus-wide occurrences of each window, and merge the duplicated
  * windows into maximal per-document spans. A span of ≥ w tokens duplicated
  * verbatim anywhere in the corpus is covered by at least one duplicated
  * window, so window-level recall is exact for spans ≥ w (and 0 for shorter
  * repeats — the same cutoff the suffix-array formulation applies).
  *
  * Scale shape (the whole point vs a suffix array):
  *   tokenize → posexplode windows (narrow, ~1 row per token) → frequency
  *   aggregation keyed on xxhash64(window) so the count shuffle moves 8-byte
  *   longs, never window text → hash-keyed semi-join flags duplicated
  *   windows → gaps-and-islands window partitioned by doc merges them into
  *   spans → per-doc aggregation reuses the doc partitioning.
  * Nothing is ever all-pairs and no state is driver-side; candidate volume
  * tracks token count, not document-pair count. At 100 TB the frequency agg
  * is the one big shuffle and it map-side combines (windows repeat).
  */
object SubstringDedup {

  /** Tokens of lower(trim(text)) split on whitespace — the corpus tokenizer
    * shared with the minhash/vocabulary family. */
  private def toks(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => t =!= "")

  private val reserved =
    Seq("__toks", "__n", "__pos", "__wh", "__cnt", "__new", "__span", "__spans")

  /** Maximal duplicated spans with the doc's token count carried along:
    * (idCol, __n, span_start, span_end) — span positions are 0-based
    * inclusive token indexes. Windows are keyed by xxhash64 of the w
    * tokens; a 64-bit collision would mark a non-duplicated window (odds
    * ~ n²/2⁶⁵ — negligible below ~10¹² windows). */
  private def spansWithCounts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      w: Int): DataFrame = {
    require(w >= 2, "windowTokens must be ≥ 2")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"SubstringDedup reserves helper column name $r"))

    val tokenized = df
      .select(col(idCol), toks(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .where(col("__n") >= w)

    // One row per window start position; only the 8-byte hash leaves the
    // projection — window text never shuffles.
    val windows = tokenized.select(
      col(idCol),
      col("__n"),
      posexplode(transform(
        sequence(lit(0), col("__n") - w),
        i => xxhash64(concat_ws(" ", slice(col("__toks"), i + 1, lit(w)))))))
      .select(col(idCol), col("__n"), col("pos").as("__pos"), col("col").as("__wh"))

    // Corpus-wide occurrence count per window hash (total occurrences, not
    // distinct docs: a window repeated within one document is duplication
    // too, exactly as in the suffix-array formulation).
    val dupHashes = windows
      .groupBy("__wh").agg(count(lit(1)).as("__cnt"))
      .where(col("__cnt") >= 2)
      .select(col("__wh"))

    // Gaps-and-islands: window at __pos covers tokens [__pos, __pos+w-1];
    // merge windows whose covered ranges touch or overlap. A new span opens
    // when this window starts beyond (previous running max end) + 1.
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val prevEnd = max(col("__pos") + w - 1)
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    windows
      .join(dupHashes, Seq("__wh"), "left_semi")
      .withColumn("__new",
        when(prevEnd.isNull || col("__pos") > prevEnd + 1, 1L).otherwise(0L))
      .withColumn("__span",
        sum(col("__new")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("__n"), col("__span"))
      .agg(min(col("__pos")).cast("long").as("span_start"),
        (max(col("__pos")) + w - 1).cast("long").as("span_end"))
  }

  /** Span-level detail: one row per maximal duplicated span,
    * (idCol, span_start, span_end) in token positions (0-based, inclusive). */
  def duplicatedSpansDetail(
      df: DataFrame,
      textCol: String,
      idCol: String,
      windowTokens: Int): DataFrame =
    spansWithCounts(df, textCol, idCol, windowTokens)
      .select(col(idCol), col("span_start"), col("span_end"))

  /** Per-document duplicated-span report: one row per document that
    * contains at least one duplicated span —
    * (doc_id, n_spans, dup_tokens, total_tokens, dup_fraction), where a
    * span covering tokens [s, e] contributes e - s + 1 to dup_tokens.
    * The per-doc aggregation reuses the doc-keyed exchange of the span
    * merge — no extra shuffle. */
  def duplicatedSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      windowTokens: Int): DataFrame =
    spansWithCounts(df, textCol, idCol, windowTokens)
      .groupBy(col(idCol), col("__n"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("dup_tokens"))
      .select(
        col(idCol),
        col("n_spans"),
        col("dup_tokens"),
        col("__n").cast("long").as("total_tokens"),
        round(col("dup_tokens").cast("double") / col("__n"), 4).as("dup_fraction"))

  /** Rewrite variant: drop every duplicated span's tokens from each
    * document (most corpus pipelines drop all copies — deterministic, no
    * global "first occurrence" order needed; keeping one copy is a policy
    * layered on top via the detail frame). Documents with no duplicated
    * span pass through with their normalized token stream intact.
    * Returns (idCol, cleaned_text, total_tokens, dup_tokens). */
  def dropDuplicatedSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      windowTokens: Int): DataFrame = {
    val spans = spansWithCounts(df, textCol, idCol, windowTokens)
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))

    df.select(col(idCol), toks(col(textCol)).as("__toks"))
      .join(spans, Seq(idCol), "left")
      .select(
        col(idCol),
        concat_ws(" ",
          filter(
            transform(col("__toks"),
              (t, i) => when(col("__spans").isNull ||
                !exists(col("__spans"),
                  sp => i.cast("long") >= sp.getField("span_start") &&
                    i.cast("long") <= sp.getField("span_end")),
                t)),
            t => t.isNotNull)).as("cleaned_text"),
        size(col("__toks")).cast("long").as("total_tokens"),
        when(col("__spans").isNull, 0L)
          .otherwise(aggregate(col("__spans"), lit(0L),
            (acc, sp) => acc + sp.getField("span_end") - sp.getField("span_start") + 1))
          .as("dup_tokens"))
  }
}
