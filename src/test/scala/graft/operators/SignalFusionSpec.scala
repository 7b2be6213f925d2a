package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SignalFusionSpec extends SparkSpec {

  import spark.implicits._

  private val rows = Seq(
    // (id, a, b): a dominant (weight .8), b tie-broken (weight .2)
    (1L, 0.9, 10L), (2L, 0.9, 30L), (3L, 0.5, 30L), (4L, 0.1, 20L))

  test("tie-averaged ranks: equal signal values share one normalized rank") {
    val out = SignalFusion.fuseRanked(rows.toDF("id", "a", "b"),
      Seq("a" -> 0.8, "b" -> 0.2), keep = Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("fused")).toMap
    // a-ranks (n=4): 0.1→1, 0.5→2, 0.9→avg(3,4)=3.5; normalized /4
    // b-ranks: 10→1, 20→2, 30→avg(3,4)=3.5
    def f(ra: Double, rb: Double) = math.rint((ra / 4 * 0.8 + rb / 4 * 0.2) * 1e6) / 1e6
    assert(out(1L) == f(3.5, 1.0))
    assert(out(2L) == f(3.5, 3.5))
    assert(out(3L) == f(2.0, 3.5))
    assert(out(4L) == f(1.0, 2.0))
  }

  test("ranking is deterministic across partitionings") {
    val df = (1 to 300)
      .map(i => (i.toLong, (i % 17).toDouble, (i % 5).toLong)).toDF("id", "a", "b")
    val x = SignalFusion.fuseRanked(df, Seq("a" -> 0.6, "b" -> 0.4), Seq("id"))
      .orderBy("rank").collect().toSeq
    val y = SignalFusion.fuseRanked(df.repartition(11),
      Seq("a" -> 0.6, "b" -> 0.4), Seq("id"))
      .orderBy("rank").collect().toSeq
    assert(x == y)
  }

  test("a heavy-tailed signal cannot swamp the blend (rank, not z-score)") {
    // one extreme outlier in b moves its own rank by one position only
    val base = Seq((1L, 0.2, 100L), (2L, 0.4, 200L), (3L, 0.6, 300L), (4L, 0.8, 400L))
    val outlier = base.updated(3, (4L, 0.8, 4000000L))
    def ranks(data: Seq[(Long, Double, Long)]) =
      SignalFusion.fuseRanked(data.toDF("id", "a", "b"),
        Seq("a" -> 0.5, "b" -> 0.5), Seq("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ranks(base) == ranks(outlier),
      "magnitude of an outlier must not change any ordering")
  }

  test("guards: empty input and empty signal list fail loudly") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "a")
    assertThrows[IllegalArgumentException] {
      SignalFusion.fuseRanked(empty, Seq("a" -> 1.0), Seq("id"))
    }
    val one = Seq((1L, 0.5)).toDF("id", "a")
    assertThrows[IllegalArgumentException] {
      SignalFusion.fuseRanked(one, Seq.empty, Seq("id"))
    }
  }
}
