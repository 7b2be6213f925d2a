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

  test("deterministic across partition layouts") {
    val base = (1L to 8000L).map(i => (s"g${i % 3}", i * 7))
    val a = Sketches.kmvDistinct(base.toDF("grp", "key").repartition(1),
      "key", "grp", k = 32).collect().map(_.toString).sorted
    val b = Sketches.kmvDistinct(base.toDF("grp", "key").repartition(13),
      "key", "grp", k = 32).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
