package graft.operators

import graft.SparkSpec

class LshPlannerSpec extends SparkSpec {

  import spark.implicits._

  test("powChain: exact integer squaring on the ppm grid") {
    // 0.5^4 on the grid: 500000 -> 250000 -> 62500
    assert(LshPlanner.powChain(500000L, 1) == 500000L)
    assert(LshPlanner.powChain(500000L, 2) == 250000L)
    assert(LshPlanner.powChain(500000L, 4) == 62500L)
    // truncation is part of the contract: 0.3^2 = 0.09 exactly on ppm
    assert(LshPlanner.powChain(300000L, 2) == 90000L)
    assert(LshPlanner.powChain(1000000L, 128) == 1000000L)
    assert(LshPlanner.powChain(0L, 8) == 0L)
    assertThrows[IllegalArgumentException](LshPlanner.powChain(10L, 3))
  }

  test("detectPpm: the S-curve endpoints and the b-vs-r trade") {
    // exact duplicates are always detected; disjoint never
    assert(LshPlanner.detectPpm(1000000L, 16, 8) == 1000000L)
    assert(LshPlanner.detectPpm(0L, 16, 8) == 0L)
    // at fixed budget b·r = 128, smaller r detects MORE at every s < 1
    val s = 600000L
    val ps = Seq((128, 1), (64, 2), (32, 4), (16, 8), (8, 16))
      .map { case (b, r) => LshPlanner.detectPpm(s, b, r) }
    assert(ps.zip(ps.tail).forall { case (hi, lo) => hi >= lo },
      s"detection must be monotone in r at fixed budget: $ps")
    // and the spread is real (r=1 catches ~everything, r=16 ~nothing here)
    assert(ps.head > 990000L && ps.last < 200000L)
  }

  test("lshPlan: chosen = the cheapest config meeting the target on a " +
    "corpus of heavy near-duplicates") {
    // 12 clusters of 4 near-identical docs (one token differs) + fillers:
    // the verified spectrum sits in the ~0.8-0.95 band
    val base = (0 until 12).map(c =>
      (0 until 30).map(i => s"tok${c}_$i").mkString(" "))
    val docs = base.zipWithIndex.flatMap { case (text, c) =>
      (0 until 4).map { v =>
        val t = if (v == 0) text else text.replace(s"tok${c}_${v * 7}", s"var$v")
        (c * 10L + v, t)
      }
    } ++ (100 until 120).map(i =>
      (i.toLong, (0 until 30).map(j => s"fill${i}_$j").mkString(" ")))
    val out = LshPlanner.lshPlan(docs.toDF("doc_id", "text"), "text",
      "doc_id", thresholdPpm = 500000L, targetPpm = 950000L).collect()
    assert(out.length == 8)
    val chosen = out.filter(_.getBoolean(4))
    assert(chosen.length == 1, "exactly one config must be chosen")
    // every cheaper (fewer-bands) config must MISS the target
    val cb = chosen.head.getLong(0)
    out.filter(_.getLong(0) < cb).foreach { r =>
      assert(r.isNullAt(2) || r.getLong(2) < 950000L)
    }
    assert(chosen.head.getLong(2) >= 950000L)
    // recall is monotone in bands at fixed budget
    val recalls = out.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(recalls.zip(recalls.tail).forall { case (lo, hi) => lo <= hi })
  }

  test("lshPlan: identical results under shuffled partition layouts") {
    val docs = (0 until 40).map { i =>
      val words = (0 until 20).map(j => s"w${(i / 2) * 20 + j}")
      (i.toLong, words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val a = LshPlanner.lshPlan(df, "text", "doc_id").collect().toSeq
    val b = LshPlanner.lshPlan(df.repartition(9), "text", "doc_id")
      .collect().toSeq
    assert(a == b)
  }
}
