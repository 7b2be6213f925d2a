package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.QualityRules

/** Streaming leg of the x111 empirical-Bayes source prior. The stateful
  * half is the per-source quality sufficient statistics — (n_docs, sum_q),
  * two numbers per source — which is exactly the aggregation state
  * Structured Streaming maintains incrementally; the shrinkage + rank is a
  * stateless view over the |sources|-row result table, applied by the
  * consumer with the SAME QualityRules.shrinkStats the batch prior uses
  * (the parity spec does precisely that and matches batch x111
  * row-for-row after every batch).
  *
  * Because the quality kernel is a pure per-row projection and the state
  * is commutative sums, out-of-order and late documents are absorbed with
  * no watermark needed — a document can only ever ADD to its source's
  * statistics. */
object StreamingSourcePrior {

  /** Running (source, n_docs, sum_q) over a document stream with columns
    * (source, text). Run with OutputMode.Complete. */
  def sourceQualityStats(docs: DataFrame): DataFrame =
    QualityRules.sourceQualityStats(docs, "text", "source")
}
