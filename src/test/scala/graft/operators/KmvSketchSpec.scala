package graft.operators

import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimate lands within the KMV error envelope on many distinct keys") {
    // 4 groups × 5000 distinct keys; k=64 → expected rel-error ~1/√62 ≈ 13%
    val df = (1L to 20000L).map(i => (s"g${i % 4}", i)).toDF("grp", "key")
    val rows = Sketches.kmvDistinct(df, "key", "grp", k = 64).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("kmv_estimate")
      assert(exact == 5000.0, r.toString)
      assert(math.abs(est - exact) / exact < 0.35,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("fewer than k distinct values: the state IS the exact answer") {
    val df = (1L to 300L).map(i => ("only", i % 40)).toDF("grp", "key")
    val r = Sketches.kmvDistinct(df, "key", "grp", k = 64).collect().head
    assert(r.getAs[Long]("n_exact") == 40L)
    assert(r.getAs[Double]("kmv_estimate") == 40.0)
  }

  test("aggregation state is bounded at k draws, however many arrive") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = graft.functions.GraftKmvAgg(Literal(0.0d), k = 16)
    var buf = agg.createAggregationBuffer()
    val rnd = new scala.util.Random(7)
    val draws = Array.fill(100000)(rnd.nextDouble())
    var other = agg.createAggregationBuffer()
    draws.zipWithIndex.foreach { case (d, i) =>
      val row = org.apache.spark.sql.catalyst.InternalRow(d)
      val a = graft.functions.GraftKmvAgg(
        org.apache.spark.sql.catalyst.expressions.BoundReference(0,
          org.apache.spark.sql.types.DoubleType, nullable = true), k = 16)
      if (i % 2 == 0) buf = a.update(buf, row) else other = a.update(other, row)
      assert(buf.size <= 16 && other.size <= 16)
    }
    val merged = agg.merge(buf, other)
    assert(merged.size == 16)
    // the merged bottom-k equals the exact bottom-k of the whole stream
    val expect = draws.distinct.sorted.take(16).toSeq
    val got = { val it = merged.iterator(); Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next().doubleValue()).toSeq }
    assert(got == expect)
    // serialized partial state is k-bounded too (what the shuffle moves)
    assert(agg.serialize(merged).length == 4 + 8 * 16)
    assert(agg.eval(merged) == 15.0 / expect.last)
  }

  test("plan audit: no window/sort over the hash stream") {
    val df = (1L to 5000L).map(i => (s"g${i % 3}", i)).toDF("grp", "key")
    val plan = Sketches.kmvDistinct(df, "key", "grp", k = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("sort"), plan)
    assert(plan.contains("graft_kmv_agg"), plan)
  }

  test("deterministic across partition layouts") {
    val base = (1L to 8000L).map(i => (s"g${i % 3}", i * 7))
    val a = Sketches.kmvDistinct(base.toDF("grp", "key").repartition(1),
      "key", "grp", k = 32).collect().map(_.toString).sorted
    val b = Sketches.kmvDistinct(base.toDF("grp", "key").repartition(13),
      "key", "grp", k = 32).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  import org.apache.spark.sql.functions.col

  test("overlap estimates are EXACT when both sketches are unsaturated") {
    // |A|=30, |B|=20, |A∩B|=10 — all below k=64, so the sketches are the
    // full distinct sets and the "estimates" must be the exact answers
    val a = (1L to 30L).map(("a", _))
    val b = (21L to 40L).map(("b", _))
    val df = (a ++ b).toDF("grp", "key")
    val sk = Sketches.kmvSketches(df, Sketches.kmvDraw(col("key")), "grp", k = 64)
    val r = Sketches.kmvOverlapEstimates(sk, k = 64).collect().head
    assert(r.getAs[String]("source_a") == "a" && r.getAs[String]("source_b") == "b")
    assert(r.getAs[Double]("union_est") == 40.0)
    assert(r.getAs[Double]("inter_est") == 10.0)
    assert(r.getAs[Double]("jaccard_est") == 0.25)
  }

  test("overlap estimates land near truth when saturated") {
    // A = 1..6000, B = 3001..9000: union 9000, inter 3000, J = 1/3
    val a = (1L to 6000L).map(("a", _))
    val b = (3001L to 9000L).map(("b", _))
    val sk = Sketches.kmvSketches((a ++ b).toDF("grp", "key"),
      Sketches.kmvDraw(col("key")), "grp", k = 256)
    val r = Sketches.kmvOverlapEstimates(sk, k = 256).collect().head
    val (u, i, j) = (r.getAs[Double]("union_est"),
      r.getAs[Double]("inter_est"), r.getAs[Double]("jaccard_est"))
    assert(math.abs(u - 9000.0) / 9000.0 < 0.2, s"union_est $u")
    assert(math.abs(j - 1.0 / 3.0) < 0.12, s"jaccard_est $j")
    assert(math.abs(i - 3000.0) / 3000.0 < 0.35, s"inter_est $i")
  }

  test("pairwise union estimate is CONSISTENT with sketching the union directly") {
    // the merge-then-estimate path must equal estimating A∪B as one group —
    // the mergeability contract that makes persisted sketches combinable
    val a = (1L to 5000L).map(i => ("a", i * 3))
    val b = (1L to 5000L).map(i => ("b", i * 2))
    val df = (a ++ b).toDF("grp", "key")
    val sk = Sketches.kmvSketches(df, Sketches.kmvDraw(col("key")), "grp", k = 64)
    val pairUnion = Sketches.kmvOverlapEstimates(sk, k = 64)
      .collect().head.getAs[Double]("union_est")
    val direct = Sketches.kmvDistinct(
      df.withColumn("grp", org.apache.spark.sql.functions.lit("all")),
      "key", "grp", k = 64).collect().head.getAs[Double]("kmv_estimate")
    assert(pairUnion == direct, s"pairwise $pairUnion vs direct $direct")
  }

  test("x87 plan audit: raw scan feeds ONE sketch aggregation; no window/sort before the pair join") {
    val docs = (1L to 200L)
      .map(i => (i, s"g${i % 5}", s"tok${i} alpha beta gamma delta tok${i % 7}"))
      .toDF("doc_id", "source", "text")
    val plan = Sketches.kmvSourceOverlap(docs, "text", "source", 3, 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_kmv_sketch_agg"), plan)
    assert(!plan.contains("Window"), plan)
    // the only sort allowed is the array_sort over k-bounded arrays in the
    // pair projection — no SortExec node may appear
    assert(!plan.contains("Sort ["), plan)
  }
}
