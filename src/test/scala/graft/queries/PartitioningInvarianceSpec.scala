package graft.queries

import graft.SparkSpec

/** Generic partitioning-invariance harness over the evaluation-science
  * pack: every member is exact-integer/derandomized BY DESIGN (decimal
  * sums, md5 draws, fixed-point ranks, quantize-before-sum moments), so
  * its result must be IDENTICAL under any partition layout. This pins
  * that property at spec time — the x109 round-9 flake (order-dependent
  * fp accumulation that only surfaced as a run-to-run oracle hash flip)
  * is exactly the regression class this catches early.
  *
  * Three layouts per query: single-partition (serial reference),
  * mid-parallel, and heavily over-partitioned with tiny scan splits
  * (forces multi-split file reads AND 97-way exchanges — merge orders
  * maximally different from layout 1). Results must match row-for-row:
  * every query declares a total ORDER BY, so ordered equality is the
  * right comparison. */
class PartitioningInvarianceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ≥ 20 members spanning the pack's families: rank tests, contingency
  // tests, moment tests, drift, effect sizes, calibration, time-series,
  // survival, A/B, permutation draws, plus the gram-fit consumers whose
  // determinism round 10 re-founded (x109/x110 latent class).
  private val members = Seq(
    "x109_pca_project", "x110_ridge_probe", "x112_probe_eval",
    "x164_wilcoxon_paired", "x171_ks_test", "x172_ab_ztest",
    "x173_permutation_test", "x176_wasserstein", "x177_chi2_cramers_v",
    "x180_psi_drift", "x182_mann_kendall", "x184_acf", "x185_theil_sen",
    "x191_cliffs_delta", "x192_gains_lift", "x194_brier_decomposition",
    "x195_kruskal_wallis", "x196_anova_f", "x197_mcnemar",
    "x198_pav_calibration", "x200_boxcox_scan", "x204_effect_size",
    "x205_nelson_aalen", "x208_cochran_q", "x210_runs_test",
    "x213_jarque_bera", "x214_cuped", "x215_mde", "x216_welch_t",
    "x219_ab_readout",
    // round-10 additions: gram-ablation refits, TakeOrdered + ordered
    // fold, exact-ppm fairness cells, day-frame cumsums, integer Sinkhorn
    "x228_logo_influence", "x229_hill_tail", "x230_fairness_audit",
    "x231_msprt_monitor", "x232_sinkhorn_ot", "x233_lsh_plan",
    "x234_good_turing", "x235_capture_recapture")

  // (shuffle.partitions, files.maxPartitionBytes): serial / default / a
  // 97-way layout with 64 KB splits so even sf0.001 parquet fans out
  private val layouts = Seq(
    ("1", "134217728"),
    ("8", "134217728"),
    ("97", "65536"))

  private def checkInvariant(names: Seq[String], label: String): Unit = {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val runs = layouts.map { case (sp, mpb) =>
        spark.conf.set("spark.sql.shuffle.partitions", sp)
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        try {
          val rows = fn(spark, dir).collect().toSeq
          spark.sharedState.cacheManager.clearCache()
          rows
        } finally {
          spark.conf.unset("spark.sql.shuffle.partitions")
          spark.conf.unset("spark.sql.files.maxPartitionBytes")
        }
      }
      if (!(runs(0) == runs(1) && runs(1) == runs(2))) {
        val diff01 = runs(0).zip(runs(1)).indexWhere { case (a, b) => a != b }
        val diff12 = runs(1).zip(runs(2)).indexWhere { case (a, b) => a != b }
        failures += s"$name: sizes ${runs.map(_.size).mkString("/")}, " +
          s"first diffs at $diff01 (1-vs-8) / $diff12 (8-vs-97)"
      }
    }
    assert(failures.isEmpty,
      s"partition-layout-dependent results ($label):\n${failures.mkString("\n")}")
  }

  test(s"${members.size} evaluation-pack queries are partition-layout invariant") {
    checkInvariant(members, "fixed members")
  }

  // COMMITTED rotation seed — bump alongside each round's commits so the
  // drawn subset rotates with the code, not with the wall clock: a
  // failure observed at any commit replays at that commit, forever,
  // with no environment capture needed. (The previous week-of-year seed
  // made a red run irreproducible one week later.)
  private val rotationSeed = 202612L // round 12

  test("rotating 20-query subset is partition-layout invariant") {
    // layout coverage BY DEFAULT for queries outside the fixed list: a
    // committed-seed deterministic draw rotates through the whole
    // declared surface over successive rounds, so a new pack member gets
    // its layout audit without anyone remembering to enlist it. Override
    // the seed (SPARK_GRAFT_INVARIANCE_SEED) to audit any other subset.
    val fixed = members.toSet
    val pool = graft.SparkEntry.queries.keys.filterNot(fixed).toSeq.sorted
    val seed = sys.env.get("SPARK_GRAFT_INVARIANCE_SEED").map(_.toLong)
      .getOrElse(rotationSeed)
    val subset = new scala.util.Random(seed).shuffle(pool).take(20)
    info(s"seed=$seed subset=${subset.mkString(",")}")
    // seed + full subset ride in the label so a red CI log is
    // self-contained — replay with SPARK_GRAFT_INVARIANCE_SEED=<seed>
    checkInvariant(subset,
      s"rotating, seed=$seed, subset=${subset.mkString(",")}")
  }
}
