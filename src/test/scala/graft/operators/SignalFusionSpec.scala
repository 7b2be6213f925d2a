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

  test("looTargetEncoding: the row's own label never leaks; smoothing exact") {
    import org.apache.spark.sql.functions.col
    // group g: targets (1, 1, 0); group h: a singleton positive
    val df = Seq((1L, "g", 1L), (2L, "g", 1L), (3L, "g", 0L), (4L, "h", 1L))
      .toDF("id", "grp", "t")
    val out = SignalFusion.looTargetEncoding(df, col("id"), col("grp"),
      col("t"), alpha = 1, beta = 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("enc_ppm")).toMap
    // row 1 (t=1): (2−1+1)·1e6 div (3−1+2) = 500000 — its own 1 excluded
    assert(out(1L) == 500000L)
    assert(out(2L) == 500000L)
    // row 3 (t=0): (2−0+1)·1e6 div 4 = 750000
    assert(out(3L) == 750000L)
    // singleton: (1−1+1)·1e6 div (1−1+2) = 500000 — smoothing keeps it finite
    assert(out(4L) == 500000L)
  }

  test("looTargetEncoding: encoding is independent of sibling partitioning " +
    "and differs from the leaky group mean") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 300L).map(i => (i, s"g${i % 7}", i % 3 min 1))
      .toDF("id", "grp", "t")
    val a = SignalFusion.looTargetEncoding(df, col("id"), col("grp"), col("t"))
      .orderBy("id").collect().map(_.toString).toSeq
    val b = SignalFusion.looTargetEncoding(df.repartition(11), col("id"),
      col("grp"), col("t")).orderBy("id").collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
    // within a group, a positive and a negative row must encode DIFFERENTLY
    // (the leaky variant gives every member the same group mean)
    val byGrp = SignalFusion.looTargetEncoding(df, col("id"), col("grp"), col("t"))
      .collect().groupBy(_.getAs[String]("grp"))
    val mixed = byGrp.values.find(rs => rs.map(_.getAs[Long]("target")).toSet.size == 2).get
    assert(mixed.map(r => (r.getAs[Long]("target"), r.getAs[Long]("enc_ppm")))
      .toSet.size == 2)
  }
}
