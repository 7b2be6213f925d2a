package graft.operators

import graft.SparkSpec

class KnnLabelAuditSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around orthogonal axes; one vector of cluster B
  // carries cluster A's label — the planted noise the audit must flag
  private def fixture = {
    def v(axis: Int, i: Int): Seq[Float] =
      (0 until 4).map(d => (if (d == axis) 10f else 0f) + i * 0.01f)
    val a = (1 to 6).map(i => (i.toLong, v(0, i), 0))
    val b = (7 to 12).map(i => (i.toLong, v(1, i), if (i == 9) 0 else 1))
    (a ++ b).toDF("vec_id", "embedding", "label")
  }

  test("planted label noise is flagged; clean rows are not") {
    val out = Similarity.knnLabelAudit(fixture, "vec_id", "embedding",
      "label", k = 3, nCells = 1)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val noisy = out(9L)
    assert(noisy.getAs[Boolean]("flagged"),
      "the mislabeled cluster-B vector must be flagged")
    assert(noisy.getAs[Int]("vote_label") == 1)
    assert(noisy.getAs[Long]("vote_cnt") == 3L,
      "all 3 nearest neighbors sit in cluster B")
    val clean = out.filter(_._1 != 9L)
    assert(clean.values.forall(!_.getAs[Boolean]("flagged")),
      "no clean row may be flagged on this separable fixture")
    assert(out.size == 12)
  }

  test("a vector alone in its cell reports NULL vote, unflagged") {
    val lonely = Seq((1L, Seq(1f, 0f), 0), (2L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    // nCells = 2: the two orthogonal vectors land in different cells
    val rows = Similarity.knnLabelAudit(lonely, "vec_id", "embedding",
      "label", k = 3, nCells = 2).collect()
    if (rows.forall(_.isNullAt(2))) {
      assert(rows.forall(!_.getAs[Boolean]("flagged")))
    } else {
      // pivot draw may co-locate them — then each votes on the other
      assert(rows.forall(r => !r.isNullAt(2)))
    }
  }

  test("deterministic in the seed, partition-invariant") {
    val a = Similarity.knnLabelAudit(fixture, "vec_id", "embedding",
      "label", k = 3, nCells = 2).orderBy("id")
      .collect().map(_.toString).toSeq
    val b = Similarity.knnLabelAudit(fixture.repartition(5), "vec_id",
      "embedding", "label", k = 3, nCells = 2).orderBy("id")
      .collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }
}
