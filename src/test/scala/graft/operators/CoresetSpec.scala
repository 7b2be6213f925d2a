package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Similarity.kCenterCoreset — greedy farthest-point selection. */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  test("farthest-point traversal on a line picks the known sequence") {
    val df = Seq(
      (1L, Array(0.0f)), (2L, Array(10.0f)), (3L, Array(1.0f)),
      (4L, Array(9.0f)), (5L, Array(5.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterCoreset(df, "vec_id", "embedding", k = 3)
      .collect().toSeq
    // seed = lowest id (1 at 0.0); farthest is 2 (d²=100); then 5 (d²=25)
    assert(got == Seq(Row(1L, 1L, 0.0), Row(2L, 2L, 100.0), Row(3L, 5L, 25.0)))
  }

  test("ties break on id; k beyond corpus size returns what exists") {
    val df = Seq((7L, Array(0.0f)), (3L, Array(4.0f)), (9L, Array(-4.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterCoreset(df, "vec_id", "embedding", k = 10)
      .collect().toSeq
    // seed 3 (lowest id, at 4.0); 9 at -4 (d²=64) beats 7 at 0 (d²=16);
    // then 7 with min-dist-to-{3,9} = 16
    assert(got == Seq(Row(1L, 3L, 0.0), Row(2L, 9L, 64.0), Row(3L, 7L, 16.0)))
  }

  test("empty corpus → empty result with the contract schema; k bound enforced") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Similarity.kCenterCoreset(empty, "vec_id", "embedding", k = 3)
    assert(out.isEmpty && out.columns.toSeq == Seq("rank", "vec_id", "dist_sq"))
    intercept[IllegalArgumentException] {
      Similarity.kCenterCoreset(empty, "vec_id", "embedding", k = 65)
    }
  }

  test("coverage property: every point is within the last selection radius of the set") {
    // Gonzalez invariant: after selecting k centers, max min-dist over the
    // remaining points is ≤ the k-th selection distance
    val rng = new scala.util.Random(7)
    val pts = (1L to 200L).map(i => (i, Array.fill(4)(rng.nextFloat())))
    val df = pts.toDF("vec_id", "embedding")
    val sel = Similarity.kCenterCoreset(df, "vec_id", "embedding", k = 8).collect()
    val centers = sel.map(r => pts(r.getLong(1).toInt - 1)._2.map(_.toDouble))
    val lastD = sel.last.getDouble(2)
    val maxMin = pts.map { case (_, v) =>
      centers.map(c => v.map(_.toDouble).zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
    }.max
    assert(maxMin <= lastD + 1e-9, s"coverage violated: $maxMin > $lastD")
  }
}
