package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImportanceWeightsSpec extends SparkSpec {
  import spark.implicits._

  private val targetDocs = Seq(
    (101L, "the quick brown fox jumps over the lazy dog"),
    (102L, "the quick red fox runs past the sleepy dog"),
    (103L, "a brown dog and a quick fox play by the river")
  ).toDF("doc_id", "text")

  private val rawDocs = Seq(
    (1L, "the quick brown fox naps near the lazy dog"),   // target-like
    (2L, "a quick fox chases the brown dog at the river"), // target-like
    (3L, "quarterly revenue guidance exceeded analyst consensus estimates"), // off-target
    (4L, "molecular dynamics simulations converge under periodic boundaries"), // off-target
    (5L, "the quick brown fox jumps over the lazy dog")   // verbatim target text
  ).toDF("doc_id", "text")

  test("target-like documents outweigh off-target ones; top-k is deterministic") {
    val ratios = ImportanceWeights.fitLogRatios(targetDocs, rawDocs, "text", "doc_id")
    val w = ImportanceWeights.score(rawDocs, "text", "doc_id", ratios)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L))
    val targetLike = Seq(1L, 2L, 5L).map(w)
    val offTarget = Seq(3L, 4L).map(w)
    assert(targetLike.min > offTarget.max,
      s"target-like $targetLike must outrank off-target $offTarget")

    val picked = ImportanceWeights.selectTopK(rawDocs, targetDocs,
      "text", "doc_id", k = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(picked == Set(1L, 2L, 5L), picked.toString)
  }

  test("gram hash kernel: n unigrams then n-1 bigrams; bigram = whole-string FNV") {
    import org.apache.spark.unsafe.types.UTF8String
    def fnvFmix(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.foreach { c => h ^= c; h *= 0x100000001b3L }
      var x = h
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33
      x
    }
    // mixed case + irregular whitespace: tokenizes to (alpha, beta, gamma)
    val arr = graft.functions.GraftHashUtil.gramHashesFnv(
      UTF8String.fromString(" Alpha  beta\tgamma "))
    val got = (0 until arr.numElements()).map(arr.getLong)
    val want = Seq("alpha", "beta", "gamma", "alpha beta", "beta gamma").map(fnvFmix)
    assert(got == want, s"$got vs $want")
  }

  test("empty or whitespace-only documents produce no weight row") {
    val raw = rawDocs.unionByName(
      Seq((9L, ""), (10L, "   ")).toDF("doc_id", "text"))
    val ratios = ImportanceWeights.fitLogRatios(targetDocs, raw, "text", "doc_id")
    val ids = ImportanceWeights.score(raw, "text", "doc_id", ratios)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(9L) && !ids.contains(10L))
  }

  test("the ratio table stays bucket-bounded and broadcasts into the scoring join") {
    val ratios = ImportanceWeights.fitLogRatios(targetDocs, rawDocs, "text", "doc_id")
    assert(ratios.count() <= ImportanceWeights.DefaultBuckets)
    val scored = ImportanceWeights.score(rawDocs, "text", "doc_id", ratios)
    scored.collect()
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    def flatten(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case o => o +: o.children.flatMap(flatten)
    }
    assert(flatten(scored.queryExecution.executedPlan)
      .exists(_.isInstanceOf[BroadcastExchangeLike]),
      "the bucket-bounded ratio table must broadcast")
  }
}
