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
      nearDupThreshold: Double = 0.8): (DataFrame, Report) = {

    val input = docs.count()

    val quality = docs
      .withColumn("__q", TextAnalysis.qualityScore(col(textCol)))
      .where(col("__q") >= minQuality)
    val afterQuality = quality.count()

    val lang =
      if (keepLangs.isEmpty) quality
      else quality
        .withColumn("__lang", TextAnalysis.langId(col(textCol)))
        .where(col("__lang").isin(keepLangs: _*))
    val afterLang = lang.count()

    val exact = Dedup.dropExactDuplicates(lang, textCol, idCol)
    // the dedup'd set feeds both the near-dup join and the final filter
    exact.persist()
    val afterExact = exact.count()

    val nearPairs = Dedup.minhashNearDuplicates(
      exact, textCol, idCol, threshold = nearDupThreshold)
    val drop = nearPairs.select(col("id_b").as(idCol)).distinct()
    val cleaned = exact.join(drop, Seq(idCol), "left_anti")
      .withColumn("__n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("__n_tokens_bpe", TextAnalysis.tokenCountBpe(col(textCol)))

    cleaned.persist()
    val afterNear = cleaned.count()
    val totalTokens = cleaned.agg(sum("__n_tokens")).head().getLong(0)
    exact.unpersist()

    (cleaned, Report(input, afterQuality, afterLang, afterExact, afterNear, totalTokens))
  }
}
