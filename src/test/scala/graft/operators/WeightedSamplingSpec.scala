package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts for the round-7 sampling/layout additions: Efraimidis-
  * Spirakis weighted reservoir (x83) and rendezvous sharding (x84). */
class WeightedSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("weighted reservoir: exact k per category, weight-proportional inclusion") {
    // two categories; in "biased", doc ids 0-9 carry weight 100, the other
    // 190 rows weight 1 — the heavy rows must dominate the sample across
    // independent seeds (inclusion probability ≈ 1 for w=100 at k=10)
    val df = (0L until 200L).map { i =>
      ("biased", i, if (i < 10) 100L else 1L)
    }.toDF("cat", "id", "w")

    val seeds = Seq("s1", "s2", "s3", "s4", "s5")
    val heavyHits = seeds.map { seed =>
      val got = MixtureSampling.weightedReservoirPerCategory(
        df, "cat", "id", "w", k = 10, seed = seed)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got.size == 10, s"seed $seed: expected exactly k rows")
      got.count(_ < 10L)
    }
    val avgHeavy = heavyHits.sum.toDouble / seeds.size
    info(f"avg heavy-row inclusions over ${seeds.size} seeds = $avgHeavy%.1f / 10")
    // with w=100 vs w=1 the heavy rows win ~9-10 of 10 slots; uniform
    // sampling would give 0.5 — a generous floor of 7 separates the two
    assert(avgHeavy >= 7.0, f"weighted inclusion too low: $avgHeavy%.1f")
  }

  test("weighted reservoir: deterministic across layouts, non-positive weights excluded") {
    val df = (0L until 500L).map(i =>
      (s"c${i % 3}", i, if (i % 50 == 0) 0L else i % 7 + 1)).toDF("cat", "id", "w")
    val a = MixtureSampling.weightedReservoirPerCategory(
      df.repartition(1), "cat", "id", "w", k = 5)
      .collect().map(_.toString).sorted.toSeq
    val b = MixtureSampling.weightedReservoirPerCategory(
      df.repartition(13), "cat", "id", "w", k = 5)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
    // zero-weight rows can never be sampled
    val ids = MixtureSampling.weightedReservoirPerCategory(
      df, "cat", "id", "w", k = 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids.forall(_ % 50 != 0), "a zero-weight row was sampled")
  }

  test("hrw sharding: minimal reassignment when a shard joins") {
    val df = spark.range(20000L).select(col("id").as("doc_id"))
    val s16 = Sharding.hrwShard(df, "doc_id", nShards = 16)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val s17 = Sharding.hrwShard(df, "doc_id", nShards = 17)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

    val moved = s16.keys.filter(k => s16(k) != s17(k)).toSeq
    // every moved row moved TO the new shard — survivors never trade rows
    assert(moved.forall(k => s17(k) == 16),
      s"rows moved between surviving shards: ${moved.filter(k => s17(k) != 16).take(5)}")
    val frac = moved.size.toDouble / s16.size
    info(f"reassigned fraction at 16→17 shards = $frac%.4f (ideal 1/17 = ${1.0 / 17}%.4f)")
    assert(frac > 0.04 && frac < 0.08, f"reassignment fraction $frac%.4f off the 1/17 ideal")

    // balance: uniform hashing keeps every shard within 2x of the mean
    val sizes = s16.values.groupBy(identity).map(_._2.size)
    assert(sizes.min > 20000 / 16 / 2 && sizes.max < 20000 / 16 * 2,
      s"shard sizes out of balance: min=${sizes.min} max=${sizes.max}")
  }
}
