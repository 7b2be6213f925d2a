package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConformalSpec extends SparkSpec {
  import spark.implicits._

  // two sources with different locations, deterministic noise in ±20
  private def corpus = (1L to 900L).map { i =>
    val grp = if (i % 2 == 0) "a" else "b"
    val base = if (grp == "a") 500L else 900L
    (i, grp, base + ((i * 37) % 41) - 20L)
  }.toDF("id", "grp", "v")

  test("driver replay: the q-rank residual and per-group coverage are exact") {
    val rows = corpus.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))
    val fold = (id: Long) => id % 3
    val train = rows.filter(r => fold(r._1) == 0)
    val pred = train.groupBy(_._2).map { case (g, rs) =>
      g -> rs.map(_._3).sum * 1000000L / rs.size
    }
    val calib = rows.filter(r => fold(r._1) == 1)
      .map(r => math.abs(r._3 * 1000000L - pred(r._2))).sorted
    val qRank = math.min(calib.size.toLong,
      ((calib.size + 1) * 900000L + 999999L) / 1000000L)
    val q = calib((qRank - 1).toInt)
    val got = Conformal.splitConformalReport(corpus, col("grp"), col("v"),
      col("id") % 3, alphaPpm = 100000L)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(got.size == 2)
    got.foreach { case (g, r) =>
      assert(r.getAs[Long]("q_ppm") == q && r.getAs[Long]("q_rank") == qRank)
      val test = rows.filter(x => fold(x._1) == 2 && x._2 == g)
      val covered = test.count(x => math.abs(x._3 * 1000000L - pred(g)) <= q)
      assert(r.getAs[Long]("n_test") == test.size)
      assert(r.getAs[Long]("n_covered") == covered)
      assert(r.getAs[Long]("coverage_ppm") == covered * 1000000L / test.size)
      // the conformal guarantee: ≥ ~90% coverage on this iid fixture
      assert(r.getAs[Long]("coverage_ppm") >= 850000L,
        s"$g covered only ${r.getAs[Long]("coverage_ppm")} ppm")
    }
  }

  test("partition-invariant; groups without a train fold drop") {
    val a = Conformal.splitConformalReport(corpus, col("grp"), col("v"),
      col("id") % 3).orderBy("grp").collect().map(_.toString).toSeq
    val b = Conformal.splitConformalReport(corpus.repartition(7), col("grp"),
      col("v"), col("id") % 3).orderBy("grp").collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
    // a group appearing ONLY in the test fold has no predictor → absent
    val extra = corpus.unionAll(Seq((902L, "only-test", 123L)).toDF("id", "grp", "v"))
    val got = Conformal.splitConformalReport(extra, col("grp"), col("v"),
      col("id") % 3).collect().map(_.getAs[String]("grp")).toSet
    assert(got == Set("a", "b"))
  }
}
