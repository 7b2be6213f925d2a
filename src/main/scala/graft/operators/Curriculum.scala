package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curriculum ordering — bucket a corpus into difficulty tiers for staged
  * training (easy-first schedules order by a difficulty proxy; document
  * length is the classic one). The bucketing is SQL NTILE semantics over a
  * caller-chosen total order, computed WITHOUT a global single-partition
  * window: the global rank comes from Sharding.rankByColumns' two-phase
  * range-exchange recipe, and the NTILE arithmetic is a closed-form
  * function of (rank, n, buckets) — so the whole operator is one range
  * exchange plus a broadcast scalar, at any corpus size.
  */
object Curriculum {

  /** Assign each row an NTILE-style bucket 1..nBuckets over the ascending
    * (difficultyCol, idCol) order. Exactly SQL `ntile(nBuckets) OVER
    * (ORDER BY difficultyCol, idCol)`: the first (n mod k) buckets hold
    * ceil(n/k) rows, the rest floor(n/k). Output = input columns +
    * `bucket` (long). Deterministic: idCol must be unique. */
  def difficultyBuckets(
      docs: DataFrame,
      difficultyCol: String,
      idCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be ≥ 1")
    require(!docs.columns.contains("bucket") && !docs.columns.contains("__n"),
      "difficultyBuckets reserves column names bucket, __n")
    val ranked = Sharding.rankByColumns(docs, Seq(difficultyCol, idCol))
    val n = docs.agg(count(lit(1)).as("__n"))
    val k = nBuckets.toLong
    // NTILE closed form on 0-based pos: big = n mod k buckets of size
    // s+1 = (n div k)+1 fill first; greatest(, 1) keeps the ELSE branch's
    // divisor nonzero when n < k (that branch is then never selected, but
    // both sides of a CASE are codegen'd).
    val bucket = expr(
      s"""CASE WHEN pos < (__n % $k) * ((__n div $k) + 1)
         |  THEN pos div ((__n div $k) + 1) + 1
         |  ELSE (__n % $k) + (pos - (__n % $k) * ((__n div $k) + 1)) div greatest(__n div $k, 1) + 1
         |END""".stripMargin)
    ranked
      .crossJoin(broadcast(n))
      .withColumn("bucket", bucket)
      .drop("__n", "pos")
  }

  /** Per-bucket curriculum summary: row counts and the difficulty range of
    * each tier — the sanity view a training scheduler reads before picking
    * stage boundaries. Reuses the bucket assignment's exchanges. */
  def bucketSummary(
      docs: DataFrame,
      difficultyCol: String,
      idCol: String,
      nBuckets: Int): DataFrame =
    difficultyBuckets(docs, difficultyCol, idCol, nBuckets)
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col(difficultyCol)).as("min_difficulty"),
        max(col(difficultyCol)).as("max_difficulty"))
}
