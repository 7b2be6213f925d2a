package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** similarityJoinAuto (x247/x248's operator): the budget gate must FLIP
  * the executed plan, and the approximate route must stay a subset of
  * the exact route's pairs while meeting the planned recall floor. */
class SimilarityJoinAutoSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the x154 fixture: clean 40-char titles vs one-char-deleted twins
  private def fixture: (DataFrame, DataFrame) = {
    val d = graft.queries.Tables.documents(spark, dir)
    val clean = d.select(col("doc_id"), substring(col("text"), 1, 40).as("title"))
    val dirty = d.select(col("doc_id"),
      expr("concat(substr(substr(text, 1, 40), 1, CAST(doc_id % 31 AS INT)), " +
        "substr(substr(text, 1, 40), CAST(doc_id % 31 AS INT) + 2))")
        .as("dirty_title"))
    (clean, dirty)
  }

  // each of these executes the full fixture join end-to-end — compute
  // once per suite (the round-12 suite-wall-time item: the previous
  // per-test recomputation ran the join ~6× across 5 tests)
  private lazy val exact: Seq[(Long, Long, Long)] = exactPairs
  private lazy val autoApprox: Seq[(Long, Long, Long, String)] = runAuto(budget = 1L)

  private def runAuto(budget: Long, target: Long = 950000L): Seq[(Long, Long, Long, String)] = {
    val (clean, dirty) = fixture
    val out = FuzzyLinkage.similarityJoinAuto(clean, dirty, "doc_id", "title",
      "doc_id", "dirty_title", maxDist = 1, q = 3,
      budgetPairs = budget, numPerms = 64, targetRecallPpm = target)
      .orderBy("left_id", "right_id")
    val materialized = out.cache()
    materialized.count()
    FuzzyLinkage.releaseCaches()
    val rows = materialized.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    materialized.unpersist(blocking = false)
    rows
  }

  private def exactPairs: Seq[(Long, Long, Long)] = {
    val (clean, dirty) = fixture
    val out = FuzzyLinkage.qgramJoin(clean, dirty, "doc_id", "title",
      "doc_id", "dirty_title", maxDist = 1, q = 3)
      .orderBy("left_id", "right_id")
    val materialized = out.cache()
    materialized.count()
    FuzzyLinkage.releaseCaches()
    val rows = materialized.collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    materialized.unpersist(blocking = false)
    rows
  }

  test("a generous budget routes to the exact plan and reproduces qgramJoin") {
    val auto = runAuto(budget = 100000000L)
    assert(auto.nonEmpty)
    assert(auto.forall(_._4 == "qgram_exact"))
    assert(auto.map(t => (t._1, t._2, t._3)) == exact)
  }

  test("a one-pair budget flips the executed plan to the minhash route") {
    assert(autoApprox.nonEmpty)
    assert(autoApprox.forall(_._4 == "approximate_minhash"))
  }

  test("approximate route: subset of exact, recall >= the planned floor") {
    val exactSet = exact.map(t => (t._1, t._2)).toSet
    val auto = autoApprox.map(t => (t._1, t._2)).toSet
    // precision 1 by construction: every survivor passed the same
    // Levenshtein predicate the exact route applies
    assert(auto.subsetOf(exactSet),
      s"approximate route emitted ${ (auto -- exactSet).take(3) } outside the exact set")
    val recall = auto.size.toDouble / exactSet.size
    assert(recall >= 0.95, s"recall $recall below floor (|exact|=${exactSet.size})")
  }

  test("full-recall parameter point reproduces the exact pair set verbatim") {
    // targetRecallPpm 999999 forces the planner to (32, 2) on this
    // fixture — per-pair detection ~1-6e-17 short of certain, and the
    // hashing is deterministic: the routed pair set equals the exact one
    // (the declared x248 oracle relies on exactly this)
    val auto = runAuto(budget = 1L, target = 999999L)
    assert(auto.forall(_._4 == "approximate_minhash"))
    assert(auto.map(t => (t._1, t._2, t._3)) == exact)
  }

  test("preflight caches release before the routed join executes") {
    // the round-12 hygiene item, sharpened by the round-13 shared
    // prologue: the preflight prices from the SAME persisted frames the
    // exact route then joins (nothing is computed or cached twice), and
    // frames the route no longer needs (gram + df spectrum) release
    // right after the verdict row lands — so the auto join may pin AT
    // MOST as many RDDs as the directly-invoked route (it pins fewer:
    // the prefix frames replace the gram/df frames)
    def reset(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val (clean, dirty) = fixture
    reset()
    FuzzyLinkage.qgramJoin(clean, dirty, "doc_id", "title",
      "doc_id", "dirty_title", maxDist = 1, q = 3).count()
    val directCached = spark.sparkContext.getPersistentRDDs.size
    FuzzyLinkage.releaseCaches()
    reset()
    FuzzyLinkage.similarityJoinAuto(clean, dirty, "doc_id", "title",
      "doc_id", "dirty_title", maxDist = 1, q = 3,
      budgetPairs = 100000000L).count()
    val autoCached = spark.sparkContext.getPersistentRDDs.size
    FuzzyLinkage.releaseCaches()
    reset()
    assert(autoCached <= directCached,
      s"$autoCached RDDs cached after auto vs $directCached after direct " +
        "qgramJoin — preflight frames leaked into the routed join's execution")
  }

  test("the analytic band planner scores and picks like x233's rule") {
    // fixture geometry: shortest long string 39, d=1, q=3 → g=37,
    // floor = (37-3)/(37+3+1) = 829268 ppm, haircut → 746341
    val (b1, r1, t1) = FuzzyLinkage.planBandsForEditDistance(
      lMinLong = 39, maxDist = 1, q = 3, numPerms = 64,
      targetRecallPpm = 999999L)
    assert(t1 == 746341L)
    assert((b1, r1) == (32, 2))
    val (b2, r2, _) = FuzzyLinkage.planBandsForEditDistance(
      lMinLong = 39, maxDist = 1, q = 3, numPerms = 64,
      targetRecallPpm = 950000L)
    assert((b2, r2) == (16, 4))
    // degenerate: strings so short no positive gram bound exists →
    // threshold floors at 1 ppm and the max-recall split ships
    val (b3, r3, t3) = FuzzyLinkage.planBandsForEditDistance(
      lMinLong = 6, maxDist = 1, q = 3, numPerms = 64,
      targetRecallPpm = 950000L)
    assert(t3 >= 1L)
    assert((b3, r3) == (64, 1))
  }
}
