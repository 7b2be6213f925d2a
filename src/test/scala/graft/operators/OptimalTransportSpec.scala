package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OptimalTransportSpec extends SparkSpec {

  import spark.implicits._

  private def vec(x: Double): Array[Float] =
    Array(x.toFloat, 0.0f, 0.0f, 0.0f)

  /** Three point-mass cells on a line: c0 at 0, c1 at 1 (near c0), c2 at
    * 10 (far). Every row sits exactly on its cell centroid. */
  private def fixture(aCnt: Map[Int, Int], bCnt: Map[Int, Int]) = {
    val pos = Map(0 -> 0.0, 1 -> 1.0, 2 -> 10.0)
    val rows =
      aCnt.toSeq.sortBy(_._1).flatMap { case (c, n) =>
        (0 until n).map(_ => (c, true, vec(pos(c))))
      } ++ bCnt.toSeq.sortBy(_._1).flatMap { case (c, n) =>
        (0 until n).map(_ => (c, false, vec(pos(c))))
      }
    rows.toDF("cell", "a", "v")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    OptimalTransport.sinkhornPlan(df, "v", col("cell"), col("a"), dim = 4)
      .collect()

  test("identical distributions stay on the diagonal at ~zero cost") {
    val cnt = Map(0 -> 50, 1 -> 25, 2 -> 25)
    val out = run(fixture(cnt, cnt))
    assert(out.length == 9)
    val diag = out.filter(r => r.getLong(0) == r.getLong(1))
      .map(_.getLong(5)).sum
    assert(diag >= 950000L, s"diagonal mass $diag should be ~1e6")
    // identical marginals over identical points: the three transport
    // problems coincide, so the debiased divergence is EXACTLY zero
    assert(out.head.getLong(7) == 0L,
      s"sk_div ${out.head.getLong(7)} should be 0 for identical slices")
  }

  test("a shift to the NEAR cell costs less than the same shift FAR — " +
    "the property JSD cannot see") {
    val a = Map(0 -> 50, 1 -> 25, 2 -> 25)
    val near = run(fixture(a, Map(0 -> 25, 1 -> 50, 2 -> 25)))
    val far = run(fixture(a, Map(0 -> 25, 1 -> 25, 2 -> 50)))
    val otNear = near.head.getLong(6)
    val otFar = far.head.getLong(6)
    assert(otNear < otFar,
      s"near-shift cost $otNear must undercut far-shift cost $otFar")
    assert(otNear > 0L)
    // the debiased divergence keeps the ordering and stays positive for
    // a genuine shift
    val dvNear = near.head.getLong(7)
    val dvFar = far.head.getLong(7)
    assert(dvNear > 0L && dvNear < dvFar,
      s"sk_div ordering: near $dvNear vs far $dvFar")
  }

  test("the plan honors both marginals within scaling tolerance") {
    val out = run(fixture(
      Map(0 -> 50, 1 -> 25, 2 -> 25), Map(0 -> 25, 1 -> 50, 2 -> 25)))
    val byA = out.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(5)).sum)
    val byB = out.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(5)).sum)
    out.foreach { r =>
      val aP = r.getLong(2)
      val bP = r.getLong(3)
      assert(math.abs(byA(r.getLong(0)) - aP) <= 20000L,
        s"row-marginal drift at cell ${r.getLong(0)}")
      assert(math.abs(byB(r.getLong(1)) - bP) <= 20000L,
        s"col-marginal drift at cell ${r.getLong(1)}")
    }
  }

  test("identical results under shuffled partition layouts") {
    val df = fixture(
      Map(0 -> 50, 1 -> 25, 2 -> 25), Map(0 -> 25, 1 -> 50, 2 -> 25))
    val x = run(df).toSeq
    val y = run(df.repartition(17)).toSeq
    assert(x == y)
  }

  test("guards fail loudly") {
    val one = Seq((0, true, vec(0.0)), (0, false, vec(0.0)))
      .toDF("cell", "a", "v")
    assertThrows[IllegalArgumentException] {
      OptimalTransport.sinkhornPlan(one, "v", col("cell"), col("a"), dim = 4)
    }
    val df = fixture(Map(0 -> 2, 1 -> 2), Map.empty)
    assertThrows[IllegalArgumentException] {
      OptimalTransport.sinkhornPlan(df, "v", col("cell"), col("a"), dim = 4)
    }
  }
}
