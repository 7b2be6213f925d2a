package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Data Selection via Importance Resampling,
  * Xie et al. 2023 — public): score every raw document by how target-like
  * its hashed n-gram profile is, `w(doc) = Σ_f log p_target(f) − log
  * p_raw(f)` over the doc's unigram+bigram features hashed into a fixed
  * bucket space, then keep the top-weighted documents. The standard recipe
  * for "give me more data that looks like my high-quality seed set".
  *
  * Scale shape: fitting is two explode+count aggregations (one over the
  * target set, one over the raw corpus); the learned log-ratio table is at
  * most `buckets` rows — a plan-constant-sized BROADCAST — so scoring is
  * one explode pass over the corpus joined map-side, grouped per doc. No
  * stage touches more than one corpus scan, and the feature space is
  * bounded by construction (that is the point of DSIR's hashing).
  *
  * Buckets come from md5 (first 60 bits), not a JVM hash, so an external
  * engine can replay the exact weights — the x43 oracle does. */
object ImportanceWeights {

  val DefaultBuckets = 4096

  /** Lowercased whitespace tokens + adjacent bigrams, one array. */
  private def grams(textCol: Column): Column = {
    val toks = filter(split(lower(trim(textCol)), "\\s+"), t => t =!= "")
    val bis = filter(
      zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      x => x.isNotNull)
    concat(toks, bis)
  }

  /** Feature bucket in [0, buckets): first 15 hex chars of md5 (60 bits,
    * sign-safe in a long) mod buckets — deterministic and replayable. */
  private def bucketOf(gram: Column, buckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 15), 16, 10).cast("long"), lit(buckets))

  /** One row per (idCol, bucket) feature occurrence. */
  private def features(df: DataFrame, textCol: String, idCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol), explode(grams(col(textCol))).as("gram"))
      .select(col(idCol), bucketOf(col("gram"), buckets).as("bucket"))

  /** Fit the per-bucket log-probability ratios: Laplace-smoothed
    * log((target_count+1)/(target_total+buckets)) − log the same for raw.
    * Output: (bucket, log_ratio) — at most `buckets` rows. */
  def fitLogRatios(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      idCol: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    val tc = features(target, textCol, idCol, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("tc"))
    val rc = features(raw, textCol, idCol, buckets)
      .groupBy("bucket").agg(count(lit(1)).as("rc"))
    // raw-side buckets only: a bucket absent from raw can never be scored
    val totals = tc.agg(sum("tc")).head().getLong(0) ->
      rc.agg(sum("rc")).head().getLong(0)
    val (tTot, rTot) = totals
    rc.join(tc, Seq("bucket"), "left")
      .select(col("bucket"),
        (log((coalesce(col("tc"), lit(0L)) + lit(1.0)) / lit(tTot + buckets.toDouble)) -
          log((col("rc") + lit(1.0)) / lit(rTot + buckets.toDouble))).as("log_ratio"))
  }

  /** Per-document importance weight under a fitted ratio table: the sum of
    * log-ratios over the doc's feature occurrences, rounded for stable
    * comparison. Docs with no tokens produce no row. The ratio table
    * broadcasts (≤ buckets rows). */
  def score(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      logRatios: DataFrame,
      buckets: Int = DefaultBuckets,
      roundTo: Int = 4): DataFrame =
    features(docs, textCol, idCol, buckets)
      .join(broadcast(logRatios), Seq("bucket"))
      .groupBy(idCol)
      .agg(round(sum("log_ratio"), roundTo).as("dsir_weight"))

  /** The composed selection: fit target-vs-raw ratios, weight every raw
    * doc, keep the k most target-like (deterministic ties on id). */
  def selectTopK(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String,
      k: Int,
      buckets: Int = DefaultBuckets): DataFrame = {
    val ratios = fitLogRatios(target, raw, textCol, idCol, buckets)
    score(raw, textCol, idCol, ratios, buckets)
      .orderBy(desc("dsir_weight"), col(idCol))
      .limit(k)
  }
}
