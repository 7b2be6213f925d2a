package graft.operators

import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom semi-join is bit-identical to the exact semi-join (false positives killed)") {
    val fact = (1L to 5000L).map(i => (i, s"row$i")).toDF("k", "payload")
    // sparse, irregular key set — plenty of bloom near-misses to kill
    val keys = (1L to 5000L).filter(i => i % 37 == 0 || i % 911 == 0)
      .toDF("key")
    val got = BloomPrune.semiJoin(fact, keys, "k", "key", expectedItems = 256)
      .collect().map(_.getLong(0)).sorted
    val exact = fact.join(keys, fact("k") === keys("key"), "left_semi")
      .collect().map(_.getLong(0)).sorted
    assert(got.sameElements(exact), s"${got.length} vs ${exact.length}")
    assert(got.nonEmpty)
  }

  test("the bloom prunes at the fact scan, before the join") {
    // parquet-backed fact: a LocalRelation would let Catalyst constant-fold
    // the whole filter away, hiding the plan shape under audit
    val dir = java.nio.file.Files.createTempDirectory("bloom").toFile.getAbsolutePath
    (1L to 100L).toDF("k").write.parquet(s"$dir/fact.parquet")
    val fact = spark.read.parquet(s"$dir/fact.parquet")
    val keys = Seq(3L, 7L).toDF("key")
    val plan = BloomPrune.semiJoin(fact, keys, "k", "key")
      .queryExecution.executedPlan.toString
    // the constant-bloom filter must sit on the fact side BELOW the join
    // (executed plans print top-down: join first, its inputs after)
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(plan.indexOf("might_contain") > plan.indexOf("Join"), plan.take(2000))
  }

  test("string keys hash through the same xxhash64 path; empty key set yields empty result") {
    val fact = Seq("a", "b", "c", "d").toDF("name")
    val keys = Seq("b", "d", "zz").toDF("key")
    val got = BloomPrune.semiJoin(fact, keys, "name", "key")
      .collect().map(_.getString(0)).sorted
    assert(got.sameElements(Array("b", "d")))
    val none = BloomPrune.semiJoin(fact, spark.emptyDataset[String].toDF("key"),
      "name", "key")
    assert(none.count() == 0L)
  }
}
