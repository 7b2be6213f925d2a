package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", appendix A1
  * — a public pre-training filter recipe, same family as the heuristics in
  * TextAnalysis.qualityFeatures but exposed as the standard named rule set
  * with per-rule verdicts rather than a fused scalar score).
  *
  * Rules (all thresholds configurable, defaults = the published ones):
  *   1. word count within [minWords, maxWords]
  *   2. mean word length within [minMeanWordLen, maxMeanWordLen]
  *   3. symbol-to-word ratio ('#' or '...') ≤ maxSymbolRatio
  *   4. fraction of lines starting with a bullet ≤ maxBulletLineRatio
  *   5. fraction of lines ending with an ellipsis ≤ maxEllipsisLineRatio
  *   6. fraction of words containing an alphabetic char ≥ minAlphaWordRatio
  *   7. at least minStopwordHits distinct common stopwords present
  *
  * Scale shape: a pure per-row projection — no explode, no shuffle, no
  * state. Every feature is integer counting plus exact rational division,
  * so the report replays bit-identically in any engine (the only doubles
  * are ratios of integers; displayed ratios use the engine-independent
  * floor(x*1e4+0.5)/1e4 rounding, rule verdicts compare the unrounded
  * exact values). The higher-order filter/aggregate calls sit outside
  * whole-stage codegen; for a 100 TB hot path the same counters belong in
  * the GraftTextStats-style native kernel — this formulation is the
  * readable reference the kernel would be pinned against.
  */
object QualityRules {

  /** Published Gopher defaults (Rae et al. 2021, table A1). */
  final case class GopherThresholds(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletLineRatio: Double = 0.9,
      maxEllipsisLineRatio: Double = 0.3,
      minAlphaWordRatio: Double = 0.8,
      minStopwordHits: Int = 2)

  /** The paper's stopword list for rule 7. */
  private[graft] val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def rnd4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** Per-document Gopher report as one struct column: raw features, one
    * boolean verdict per rule, and the conjunction `pass`. */
  def gopherReport(text: Column, t: GopherThresholds = GopherThresholds()): Column = {
    val toks = TextAnalysis.tokens(text)
    val nWords = size(toks).cast("long")
    val denomW = greatest(nWords, lit(1L)).cast("double")
    val sumLen = aggregate(toks, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val meanLen = sumLen.cast("double") / denomW
    val alphaWords = size(filter(toks, w => regexp_like(w, lit("\\p{L}")))).cast("long")
    val alphaRatio = alphaWords.cast("double") / denomW
    val nSymbols = size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0))).cast("long")
    val symbolRatio = nSymbols.cast("double") / denomW
    val lines = split(text, "\n")
    val denomL = greatest(size(lines), lit(1)).cast("double")
    val bulletLines = size(filter(lines, l =>
      startswith(l, lit("- ")) || startswith(l, lit("* ")) || startswith(l, lit("• "))))
    val bulletRatio = bulletLines.cast("double") / denomL
    val ellipsisLines = size(filter(lines, l =>
      endswith(l, lit("...")) || endswith(l, lit("…"))))
    val ellipsisRatio = ellipsisLines.cast("double") / denomL
    val stopHits = size(filter(typedLit(GopherStopwords), w => array_contains(toks, w))).cast("long")

    val okWords = nWords >= t.minWords && nWords <= t.maxWords
    val okMeanLen = meanLen >= t.minMeanWordLen && meanLen <= t.maxMeanWordLen
    val okSymbol = symbolRatio <= t.maxSymbolRatio
    val okBullet = bulletRatio <= t.maxBulletLineRatio
    val okEllipsis = ellipsisRatio <= t.maxEllipsisLineRatio
    val okAlpha = alphaRatio >= t.minAlphaWordRatio
    val okStops = stopHits >= t.minStopwordHits

    struct(
      nWords.as("n_words"),
      rnd4(meanLen).as("mean_word_len"),
      rnd4(alphaRatio).as("alpha_word_ratio"),
      rnd4(symbolRatio).as("symbol_ratio"),
      rnd4(bulletRatio).as("bullet_line_ratio"),
      rnd4(ellipsisRatio).as("ellipsis_line_ratio"),
      stopHits.as("stop_hits"),
      okWords.as("ok_word_count"),
      okMeanLen.as("ok_mean_word_len"),
      okSymbol.as("ok_symbol_ratio"),
      okBullet.as("ok_bullet_lines"),
      okEllipsis.as("ok_ellipsis_lines"),
      okAlpha.as("ok_alpha_words"),
      okStops.as("ok_stopwords"),
      (okWords && okMeanLen && okSymbol && okBullet && okEllipsis && okAlpha && okStops)
        .as("pass"))
  }

  /** DataFrame form: (id, <report fields>) for every document — the audit
    * table a filtering run writes before dropping failures. */
  def gopherRules(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      t: GopherThresholds = GopherThresholds()): DataFrame =
    docs
      .select(col(idCol), gopherReport(col(textCol), t).as("__g"))
      .select(col(idCol), col("__g.*"))

  /** Empirical-Bayes per-source quality prior — the domain-reputation score
    * a Common Crawl-scale pipeline attaches to every host before touching
    * content twice (CCNet keeps per-"dump+domain" stats the same way). A
    * source's raw mean quality is unreliable at small n, so it is shrunk
    * toward the corpus mean with a pseudo-count: shrunk = (n·mean +
    * k·global)/(n + k) — the Beta-posterior mean with a global prior of
    * strength k (James–Stein-flavored partial pooling).
    *
    * Scale shape: one projection scan (the native quality kernel), one
    * keyed aggregation to (source, n, sum) partials that map-side combine,
    * one broadcast 1-row global — per-source state is two numbers
    * regardless of corpus size, and the output is |sources| rows.
    * Determinism: per-doc q is 4-dp-quantized by the kernel; both means
    * round to 6 before the (exact-arithmetic) shrinkage, so the report
    * replays in SQL. */
  def sourcePrior(
      docs: DataFrame,
      textCol: String, sourceCol: String,
      pseudoCount: Double = 20.0): DataFrame =
    shrinkStats(sourceQualityStats(docs, textCol, sourceCol), pseudoCount)

  /** Per-source quality sufficient statistics: (source, n_docs, sum_q).
    * This is the STATEFUL half of the prior — two numbers per source,
    * map-side combined — and exactly the state Structured Streaming
    * maintains incrementally (streaming/StreamingSourcePrior). */
  def sourceQualityStats(
      docs: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .select(col(sourceCol).as("source"),
        call_function("graft_quality_score", col(textCol)).as("q"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("q").as("sum_q"))
  }

  /** The stateless shrinkage view over the |sources|-row statistics table:
    * raw/global means rounded at 6, exact-arithmetic Beta-posterior
    * shrinkage rounded at 4, rank. Shared by the batch prior and the
    * streaming twin's consumer so the two legs agree by construction. */
  def shrinkStats(stats: DataFrame, pseudoCount: Double = 20.0): DataFrame = {
    val perSource = stats.select(col("source"), col("n_docs"),
      round(col("sum_q") / col("n_docs"), 6).as("raw_mean"))
    val global = stats.agg(round(sum("sum_q") / sum("n_docs"), 6).as("g"))
    perSource.crossJoin(broadcast(global))
      .select(col("source"), col("n_docs"), col("raw_mean"),
        round((col("n_docs") * col("raw_mean") + lit(pseudoCount) * col("g")) /
          (col("n_docs") + lit(pseudoCount)), 4).as("shrunk_mean"))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("shrunk_mean"), col("source"))).cast("long"))
  }
}
