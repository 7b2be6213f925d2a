package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit bloom-filter semi-join reduction — the classic distributed
  * optimization for "filter a huge fact table by a selective key set":
  * build a bloom filter over the key set (one tiny aggregate), broadcast
  * it into the fact scan as a pre-shuffle filter, then run the EXACT
  * semi-join on the pruned remainder to kill the bloom's false positives.
  * The result is bit-identical to the plain semi-join; the bloom only
  * changes how many fact rows reach the exchange.
  *
  * Spark's own InjectRuntimeFilter plans this shape automatically — but
  * only within a single optimizer run. The explicit operator covers the
  * cross-job cases that matter at 100 TB: a key set computed in one job
  * pruning another job's scan (incremental dedup against yesterday's
  * digest set, decontamination against a fixed eval suite), where the
  * optimizer never sees both sides together.
  *
  * Both sides hash with xxhash64 before touching the bloom — the same
  * convention Spark's runtime filter uses, so long/int/string keys all
  * work. The bloom rides a 1-row broadcast; nothing else moves.
  */
object BloomPrune {

  /** The serialized bloom filter of `keys.keyCol` — ONE aggregation job,
    * result is bloom-sized (~0.9 MB per million keys at the default fpp),
    * the artifact worth persisting between jobs. Null when `keys` is
    * empty. */
  def buildBloom(keys: DataFrame, keyCol: String, expectedItems: Long): Array[Byte] =
    keys.agg(
      call_function("graft_bloom_agg", xxhash64(col(keyCol)), lit(expectedItems))
        .as("__bloom"))
      .head().getAs[Array[Byte]]("__bloom")

  /** `fact` rows whose `factKey` appears in `keys.keyCol` — exact
    * left-semi semantics, bloom-pruned before the join's exchange.
    * `expectedItems` sizes the bloom (overestimate is cheap: bits scale
    * linearly; underestimate costs false-positive rate, never
    * correctness).
    *
    * Eager in the key side: `might_contain` demands a CONSTANT bloom, so
    * the blob is computed up front and embedded as a literal in the fact
    * scan's filter — the plan Spark's own runtime filter produces via a
    * scalar subquery, with the bonus that the blob is a plain value a
    * cross-job pipeline can persist and reuse. */
  def semiJoin(
      fact: DataFrame,
      keys: DataFrame,
      factKey: String,
      keyCol: String,
      expectedItems: Long = 1000000L): DataFrame = {
    require(expectedItems > 0, "expectedItems must be positive")
    val bloom = buildBloom(keys, keyCol, expectedItems)
    if (bloom == null) fact.limit(0) // empty key set: nothing can match
    else {
      val pruned = fact.where(
        call_function("graft_bloom_contains", lit(bloom), xxhash64(col(factKey))))
      pruned.join(keys, pruned(factKey) === keys(keyCol), "left_semi")
    }
  }
}
