package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** mmrSelect must run the exact greedy MMR traversal: argmax of
  * λ·rel − (1−λ)·maxSimToSelected with (score desc, id asc) ties, cosines
  * rounded before comparison. Verified against an in-memory reference. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
    val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x * x))
    val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x * x))
    BigDecimal(d / (na * nb)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def reference(
      rows: Seq[(Long, Seq[Double])], q: Seq[Double], k: Int,
      lambda: Double): Seq[(Long, Double)] = {
    val mu = 1.0 - lambda
    var pool = rows.map { case (id, v) => (id, v, cos(v, q), 0.0) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    for (_ <- 1 to math.min(k, rows.size)) {
      val pick = pool.map { case (id, v, rel, m) =>
        (id, v, lambda * rel - mu * m)
      }.minBy { case (id, _, s) => (-s, id) }
      out += ((pick._1, pick._3))
      pool = pool.filter(_._1 != pick._1).map { case (id, v, rel, m) =>
        (id, v, rel, math.max(m, cos(v, pick._2)))
      }
    }
    out.toSeq
  }

  private val rnd = new scala.util.Random(23)
  private val corpus: Seq[(Long, Seq[Double])] = (0L until 60L).map { i =>
    (i, Seq.fill(8)(rnd.nextDouble() * 2 - 1))
  }
  private val query: Seq[Double] = Seq.fill(8)(rnd.nextDouble() * 2 - 1)
  private def df = corpus.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
    .toDF("vec_id", "embedding")

  test("MMR traversal matches the in-memory greedy reference at several lambdas") {
    for (l <- Seq(0.3, 0.7, 1.0)) {
      val got = Similarity.mmrSelect(df, "vec_id", "embedding", query,
        k = 6, lambda = l)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      val expect = reference(corpus, query, 6, l)
      assert(got.map(_._1) == expect.map(_._1), s"lambda=$l ids: $got vs $expect")
      got.zip(expect).foreach { case ((_, gs), (_, es)) =>
        assert(math.abs(gs - es) < 1e-12, s"lambda=$l score drift: $gs vs $es")
      }
    }
  }

  test("lambda = 1 degenerates to plain cosine top-k") {
    val got = Similarity.mmrSelect(df, "vec_id", "embedding", query,
      k = 5, lambda = 1.0)
      .collect().map(_.getLong(1)).toSeq
    val topk = corpus.map { case (id, v) => (id, cos(v, query)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
    assert(got == topk)
  }

  test("diversity term suppresses a near-duplicate of the first pick") {
    // v1 is the best match; v2 is an almost-identical copy (rel ≈ v1,
    // sim-to-v1 ≈ 1); v3 is somewhat less relevant but well-separated —
    // at λ = 0.4 the diversity term must flip the second pick to v3:
    //   score(v2) = 0.4·0.9982 − 0.6·1.0000 ≈ −0.201
    //   score(v3) = 0.4·0.8000 − 0.6·0.7990 ≈ −0.159
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val rows = Seq(
      (1L, Seq(1.0, 0.05, 0.0, 0.0)),
      (2L, Seq(1.0, 0.06, 0.0, 0.0)),
      (3L, Seq(0.8, 0.0, 0.6, 0.0)))
    val d = rows.map { case (id, v) => (id, v.map(_.toFloat).toArray) }
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(d, "vec_id", "embedding", q,
      k = 2, lambda = 0.4)
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1L, 3L), s"near-dup not suppressed: $got")
    // plain top-2 by relevance would have been (1, 2)
    val top2 = Similarity.mmrSelect(d, "vec_id", "embedding", q,
      k = 2, lambda = 1.0).collect().map(_.getLong(1)).toSeq
    assert(top2 == Seq(1L, 2L))
  }

  test("empty corpus → contract schema; k and lambda bounds enforced") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val out = Similarity.mmrSelect(empty, "vec_id", "embedding", query, 3, 0.5)
    assert(out.isEmpty && out.columns.toSeq == Seq("rank", "vec_id", "score"))
    intercept[IllegalArgumentException] {
      Similarity.mmrSelect(empty, "vec_id", "embedding", query, 65, 0.5)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrSelect(empty, "vec_id", "embedding", query, 3, 1.5)
    }
  }
}
