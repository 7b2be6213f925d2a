package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multiplicative-weights domain reweighting (x239's operator): hand-
  * replayed integer trajectories on tiny fixtures. */
class MixtureMwSpec extends SparkSpec {

  import spark.implicits._

  test("two rounds replay the hand-computed integer trajectory") {
    // a: loss 1.0, b: loss 0.0 → round 1: m=500000, w=(575000, 425000);
    // round 2: m=575000, u=(648312, 351687), s=999999 → w=(648312, 351687)
    val df = Seq(("a", 1.0), ("b", 0.0)).toDF("d", "l")
    val rows = MixtureSampling.mixtureMwWeights(df, col("d"), col("l"),
      etaPpm = 300000L, iters = 2).collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "a" && rows(0).getLong(3) == 648312L)
    assert(rows(1).getString(0) == "b" && rows(1).getLong(3) == 351687L)
    // boost = w·K
    assert(rows(0).getLong(4) == 1296624L && rows(1).getLong(4) == 703374L)
  }

  test("equal losses keep the uniform mixture fixed") {
    val df = Seq(("a", 0.4), ("a", 0.6), ("b", 0.5), ("c", 0.5))
      .toDF("d", "l")
    val rows = MixtureSampling.mixtureMwWeights(df, col("d"), col("l"),
      iters = 8).collect()
    // all lbar = 500000 → excess 0 every round → w stays 1000000 div 3
    assert(rows.forall(_.getLong(3) == 333333L))
  }

  test("out-of-range losses saturate at the ppm clamp") {
    val df = Seq(("a", 7.5), ("b", -3.0)).toDF("d", "l")
    val rows = MixtureSampling.mixtureMwWeights(df, col("d"), col("l"),
      iters = 1).collect()
    assert(rows(0).getLong(2) == 1000000L) // a's lbar clamped to 1e6
    assert(rows(1).getLong(2) == 0L)
  }

  test("a tiny weight floors at 1 ppm instead of dropping out permanently") {
    // two high-loss domains starve the zero-loss one: the unfloored
    // truncating update zeroes c's weight by iteration 64, after which
    // the multiplicative update could never recover it. The 1 ppm floor
    // (applied after both the update and the renormalization) keeps
    // every weight positive, as the MW algorithm requires.
    val df = Seq(("a", 1.0), ("b", 1.0), ("c", 0.0)).toDF("d", "l")
    val rows = MixtureSampling.mixtureMwWeights(df, col("d"), col("l"),
      etaPpm = 300000L, iters = 64).collect()
    val w = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(w("c") == 1L, s"expected the starved domain floored at 1, got $w")
    assert(w("a") == 499999L && w("b") == 499999L)
  }

  test("partition-layout invariant; monotone: lossier domain ends heavier") {
    val rows = (0 until 90).map { i =>
      val d = "s" + (i % 3)
      (d, if (d == "s2") 0.9 else if (d == "s1") 0.5 else 0.2)
    }
    val df = rows.toDF("d", "l")
    val a = MixtureSampling.mixtureMwWeights(df, col("d"), col("l")).collect()
    val b = MixtureSampling.mixtureMwWeights(df.repartition(11), col("d"),
      col("l")).collect()
    assert(a.toSeq == b.toSeq)
    val w = a.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(w("s2") > w("s1") && w("s1") > w("s0"))
  }
}
