package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed training-data preparation pipeline — the "why" behind the
  * scale extras: given a raw document corpus, produce the cleaned corpus a
  * pretraining run would ingest, with full per-stage accounting.
  *
  * Stages (all single-scan or sketch-join shapes from this package):
  *   1. quality gate      — TextAnalysis.qualityScore ≥ minQuality
  *   2. language gate     — TextAnalysis.langId ∈ keepLangs (if set)
  *   3. exact dedup       — Dedup.dropExactDuplicates on content digest
  *   4. near-dedup        — Dedup.minhashNearDuplicates; for every surviving
  *                          near-dup pair the higher id drops (keep-first)
  *   5. token accounting  — whitespace + BPE-ish counts on the survivors
  *
  * Everything composes lazily except the near-dup pair set (a sketch join);
  * at 100 TB each stage is a filter/projection riding the same scan until
  * the dedup shuffles — exactly the shape of published pipeline recipes
  * (C4, Gopher, RefinedWeb). */
object TrainingDataPipeline {

  final case class Report(
      input: Long,
      afterQuality: Long,
      afterLang: Long,
      afterExactDedup: Long,
      afterNearDedup: Long,
      totalTokens: Long)

  def clean(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      minQuality: Double = 0.3,
      keepLangs: Seq[String] = Nil,
      nearDupThreshold: Double = 0.8,
      retainResult: Boolean = true): (DataFrame, Report) = {

    // one pass computes both gate flags; one aggregation counts the first
    // FOUR stage sizes (the exact-dedup survivor count is just the distinct
    // text count among gate survivors, so it rides the same scan) — the
    // naive per-stage count() re-evaluated the quality kernel per stage
    val flagged = docs
      .withColumn("__q_ok", TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .withColumn("__lang_ok",
        if (keepLangs.isEmpty) lit(true)
        else TextAnalysis.langId(col(textCol)).isin(keepLangs: _*))
      .persist()
    val gateOk = col("__q_ok") && col("__lang_ok")
    val stageCounts = flagged.agg(
      count(lit(1)).as("input"),
      count(when(col("__q_ok"), 1)).as("after_q"),
      count(when(gateOk, 1)).as("after_lang"),
      count_distinct(when(gateOk, col(textCol))).as("after_exact")).head()
    val input = stageCounts.getLong(0)
    val afterQuality = stageCounts.getLong(1)
    val afterLang = stageCounts.getLong(2)
    val afterExact = stageCounts.getLong(3)

    val lang = flagged.where(gateOk).drop("__q_ok", "__lang_ok")
    // the dedup'd set feeds both the near-dup join and the final filter
    val exact = Dedup.dropExactDuplicates(lang, textCol, idCol).persist()

    val nearPairs = Dedup.minhashNearDuplicates(
      exact, textCol, idCol, threshold = nearDupThreshold)
    val drop = nearPairs.select(col("id_b").as(idCol)).distinct()
    val cleaned = exact.join(drop, Seq(idCol), "left_anti")
      .withColumn("__n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("__n_tokens_bpe", TextAnalysis.tokenCountBpe(col(textCol)))

    cleaned.persist()
    val fin = cleaned.agg(count(lit(1)), sum("__n_tokens")).head()
    val afterNear = fin.getLong(0)
    val totalTokens = fin.getLong(1)
    exact.unpersist()
    flagged.unpersist()
    Dedup.releaseCaches()
    // report-only callers (benchmarks, accounting jobs) should not keep the
    // cleaned corpus cached across the rest of the job
    if (!retainResult) cleaned.unpersist()

    (cleaned, Report(input, afterQuality, afterLang, afterExact, afterNear, totalTokens))
  }
}
