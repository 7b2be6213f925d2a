package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — the count-based member of the
  * classifier-filtering family every pretraining pipeline carries (the
  * fastText-classifier role: route documents by language/domain/quality
  * label). Chosen over gradient-trained models because the fit is pure
  * counting: fully deterministic, partition-layout independent, and
  * replayable in SQL — the same reason NgramLm anchors the LM-scoring leg.
  *
  * Model: P(class) and Laplace-smoothed P(token|class) over the training
  * vocabulary; prediction argmaxes log P(class) + Σ log P(tok|class) over
  * IN-VOCABULARY tokens (OOV tokens are skipped — the standard smoothed-
  * multinomial convention; an all-OOV document falls back to the prior
  * argmax). Ties break on the class name ascending.
  *
  * The per-class sum stays SPARSE via the exact decomposition
  *   ln((n+1)/(ct_c+V)) = ln(n+1) − ln(ct_c+V):
  * unseen (class, token) pairs contribute ln(1) = 0 to the first term, so
  *   score(c, d) = prior(c) − m_d · ln(ct_c+V) + Σ_{seen} ln(n+1)
  * with m_d = the document's in-vocabulary token count (class-independent).
  * No dense vocab × classes grid is ever materialized — the naive sparse
  * join WITHOUT the m_d·ln(ct_c+V) completion is a classic NB bug (a class
  * that never saw the document's tokens would dodge its smoothing penalty
  * and win on prior alone).
  *
  * Scale shape: fit is one explode → (class, token) hash aggregation
  * (map-side combined); the token table is observed-pairs-sized and
  * broadcasts; scoring is one explode + broadcast joins + per-doc
  * re-aggregations on the document key. No driver state beyond the plan.
  */
object NaiveBayes {

  /** The fitted model: tokenLogCounts = (clazz, token, log_count) for
    * OBSERVED pairs only, log_count = ln(n+1); classStats = (clazz,
    * log_prior, log_denom) with log_denom = ln(ct_c + V). Both are plain
    * DataFrames — persist as Parquet to reuse across jobs. */
  final case class NbModel(tokenLogCounts: DataFrame, classStats: DataFrame)

  private def toks(textCol: String) =
    filter(split(lower(trim(col(textCol))), "\\s+"), t => t =!= "")

  def fit(
      docs: DataFrame,
      textCol: String,
      labelCol: String): NbModel = {
    val postings = docs.select(col(labelCol).as("clazz"), explode(toks(textCol)).as("token"))
    val grid = postings.groupBy("clazz", "token").agg(count(lit(1)).as("n"))
    val classTotals = grid.groupBy("clazz").agg(sum(col("n")).as("ct"))
    val vocab = grid.select("token").distinct().agg(count(lit(1)).as("v"))
    val nDocs = docs.groupBy(col(labelCol).as("clazz")).agg(count(lit(1)).as("nd"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    val tokenLogCounts = grid
      .select(col("clazz"), col("token"), log(col("n") + lit(1.0)).as("log_count"))
    val classStats = nDocs
      .join(classTotals, Seq("clazz"))
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(total))
      .select(col("clazz"),
        log(col("nd") * lit(1.0) / col("n_total")).as("log_prior"),
        log(col("ct") + col("v")).as("log_denom"))
    NbModel(tokenLogCounts, classStats)
  }

  /** Classify each document: (id, predicted, score) — score is the winning
    * class' log-posterior, engine-independent floor-rounded to 4. */
  def predict(
      docs: DataFrame,
      model: NbModel,
      textCol: String,
      idCol: String): DataFrame = {
    val postings = docs.select(col(idCol).as("id"), explode(toks(textCol)).as("token"))
    val vocabTokens = model.tokenLogCounts.select("token").distinct()
    // in-vocab token count per doc, multiplicity preserved (left_semi keeps
    // every matching posting row)
    val m = postings.join(broadcast(vocabTokens), Seq("token"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("m"))
    val sparse = postings
      .join(broadcast(model.tokenLogCounts), Seq("token"))
      .groupBy("id", "clazz")
      .agg(sum(col("log_count")).as("s"))
    val ids = docs.select(col(idCol).as("id"))
    val scored = ids
      .crossJoin(broadcast(model.classStats))
      .join(m, Seq("id"), "left")
      .join(sparse, Seq("id", "clazz"), "left")
      .select(col("id"), col("clazz"),
        (col("log_prior") - coalesce(col("m"), lit(0L)) * col("log_denom")
          + coalesce(col("s"), lit(0.0))).as("score"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy(desc("score"), col("clazz"))
    scored
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col("id"), col("clazz").as("predicted"),
        (floor(col("score") * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("score"))
  }
}
