package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring — the perplexity-style quality filter of
  * the CCNet-descended pipeline recipes: score each document by the average
  * log-probability of its bigrams under a count-based LM with Laplace
  * smoothing, where the counts come from the corpus itself (self-scoring
  * ranks documents by how typical their token transitions are; gibberish,
  * boilerplate noise, and wrong-language text sit in the low tail).
  *
  * score(doc) = avg over bigrams (w1 w2) of ln((c(w1 w2) + 1) / (c(w1) + V))
  *
  * Hot-path design: tokens become xxhash64 values via the codegen'd
  * graft_token_hashes kernel ONCE per document; bigram keys are
  * xxhash64(w1h, w2h) built with arrays_zip/slice (codegen'd collection
  * ops, no interpreted higher-order functions), so every shuffle and join
  * moves 8-byte longs, never token strings. Hashing is internal only — the
  * scores come out identical to the string-keyed formulation (64-bit
  * collisions at corpus vocabulary sizes are negligible, and the DuckDB
  * oracle replays the string version to prove it). The count joins are
  * stopword-skewed by nature — AQE's skew handling splits hot keys; with a
  * bounded vocabulary the count tables can be broadcast instead.
  */
object NgramLm {

  private val caches = new CacheRegistry

  /** Unpersist this thread's per-call token-hash caches (same contract as
    * Dedup.releaseCaches: call once the scores are materialized, on the
    * thread that built them — thread-local, see CacheRegistry). */
  def releaseCaches(): Unit = caches.releaseAll()

  /** A fitted bigram LM: hashed count tables + vocabulary size. The model
    * IS two DataFrames — it scales with the corpus, ships to scorers as
    * shuffle joins (or broadcasts, when the vocabulary is bounded), and can
    * be persisted to parquet like any other table. */
  final case class BigramModel(
      bigramCounts: DataFrame, // (bh, c2)
      unigramCounts: DataFrame, // (wh, c1)
      vocabSize: Long)

  private def hashed(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), call_function("graft_token_hashes", col(textCol)).as("th"))
  }

  private def explodeBigrams(base: DataFrame, idCol: String): DataFrame = {
    val n1: Column = greatest(size(col("th")) - 1, lit(0))
    base
      .select(col(idCol), slice(col("th"), lit(1), n1).as("a1"),
        slice(col("th"), lit(2), n1).as("a2"))
      .select(col(idCol), explode(arrays_zip(col("a1"), col("a2"))).as("p"))
      .select(col(idCol), col("p.a1").as("w1h"),
        xxhash64(col("p.a1"), col("p.a2")).as("bh"))
  }

  /** Train the count-based LM on a corpus: two aggregations over one
    * kernel-tokenized scan. */
  def fit(df: DataFrame, textCol: String, idCol: String): BigramModel = {
    val base = hashed(df, textCol, idCol).persist()
    caches.tracked(base)
    val uni = base.select(explode(col("th")).as("wh"))
      .groupBy("wh").agg(count(lit(1)).as("c1"))
    val bc = explodeBigrams(base, idCol).groupBy("bh").agg(count(lit(1)).as("c2"))
    BigramModel(bc, uni, uni.count())
  }

  /** Score documents under a fitted model — the serving shape: train once
    * on the reference corpus, score any number of incoming documents (or
    * micro-batches) against the static count tables. Bigrams unseen at fit
    * time back off to count 0 (left join), which Laplace smoothing absorbs.
    * Returns (doc_id, lm_score, n_bigrams) for docs with ≥2 tokens. */
  def score(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      model: BigramModel,
      roundTo: Int = 4): DataFrame = {
    val docBi = explodeBigrams(hashed(docs, textCol, idCol), idCol)
    docBi
      .join(model.bigramCounts, Seq("bh"), "left")
      .join(model.unigramCounts.withColumnRenamed("wh", "w1h"), Seq("w1h"), "left")
      .groupBy(idCol)
      .agg(
        round(avg(log(
          (coalesce(col("c2"), lit(0L)) + lit(1.0)) /
            (coalesce(col("c1"), lit(0L)) + lit(model.vocabSize.toDouble)))), roundTo)
          .as("lm_score"),
        count(lit(1)).cast("long").as("n_bigrams"))
  }

  /** Self-scoring convenience (fit and score on the same corpus) —
    * (doc_id, lm_score, n_bigrams) for every document with ≥2 tokens.
    * lm_score is rounded to `roundTo` decimals so downstream comparisons
    * (and the DuckDB oracle) are stable across ln() implementations. */
  def bigramLmScore(
      df: DataFrame,
      textCol: String,
      idCol: String,
      roundTo: Int = 4): DataFrame =
    score(df, textCol, idCol, fit(df, textCol, idCol), roundTo)
}
