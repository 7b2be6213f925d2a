package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** neymanSample contracts: allocation ∝ N_h·σ_h with largest-remainder
  * rounding, population caps, σ=0 strata, determinism across
  * partitioning, and within-stratum draw order. */
class NeymanSampleSpec extends SparkSpec {
  import spark.implicits._

  // stratum a: 8 rows alternating 0/100 (σ=50); b: 8 rows constant 7
  // (σ=0); c: 4 rows alternating 0/10 (σ=5)
  private def corpus = (
    (1 to 8).map(i => ("a", (i % 2) * 100L, i.toLong)) ++
    (1 to 8).map(i => ("b", 7L, 100L + i)) ++
    (1 to 4).map(i => ("c", (i % 2) * 10L, 200L + i))).toDF("g", "v", "id")

  test("allocation is proportional to N_h·σ_h; σ=0 strata draw nothing") {
    // weights: a = 8·50 = 400, b = 0, c = 4·5 = 20 → quotas 10·(400/420,
    // 0, 20/420) = (9.52.., 0, 0.476..) → base (9,0,0), leftover 1 → the
    // largest fraction (a) takes it → alloc (10→capped 8? no: quota 9.52,
    // base 9, +1 = 10 > n=8 → capped 8), c gets 0
    val out = MixtureSampling.neymanSample(corpus, "g", col("v"), "id", 10)
      .collect()
    val byStratum = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byStratum.getOrElse("b", 0) == 0)
    assert(byStratum.getOrElse("a", 0) == 8) // capped at the population
    assert(byStratum.getOrElse("c", 0) == 0)
  }

  test("largest-remainder rounding fills the budget exactly when uncapped") {
    // two strata with equal weight: quotas 2.5/2.5 → bases 2/2, one
    // leftover goes to the lexically-first stratum at the fraction tie
    val df = ((1 to 6).map(i => ("a", (i % 2) * 10L, i.toLong)) ++
      (1 to 6).map(i => ("b", (i % 2) * 10L, 100L + i))).toDF("g", "v", "id")
    val out = MixtureSampling.neymanSample(df, "g", col("v"), "id", 5)
      .collect()
    val byStratum = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byStratum("a") == 3 && byStratum("b") == 2)
    assert(out.length == 5)
  }

  test("draws are deterministic and partition-layout independent") {
    val a = MixtureSampling.neymanSample(corpus.repartition(1), "g",
      col("v"), "id", 6).collect().map(_.toString).toSeq
    val b = MixtureSampling.neymanSample(corpus.repartition(7), "g",
      col("v"), "id", 6).collect().map(_.toString).toSeq
    assert(a == b)
    // rk is 1..alloc within each stratum
    val out = MixtureSampling.neymanSample(corpus, "g", col("v"), "id", 6)
      .collect()
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("all-constant corpus (every σ = 0) draws nothing") {
    val df = (1 to 6).map(i => ("a", 5L, i.toLong)).toDF("g", "v", "id")
    assert(MixtureSampling.neymanSample(df, "g", col("v"), "id", 4)
      .collect().isEmpty)
  }
}
