package graft.operators

import graft.SparkSpec

/** rrfFuse must implement fixed-point reciprocal-rank fusion exactly:
  * Σ scale div (kRrf + rank) in long arithmetic, ties to the smaller id. */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  private val scale = 1000000000000L

  private def reference(
      lists: Seq[Seq[(Long, Long)]], kRrf: Long): Map[Long, (Long, Long, Long)] =
    lists.flatten.groupBy(_._1).map { case (id, rs) =>
      (id, (rs.map(r => scale / (kRrf + r._2)).sum, rs.size.toLong, rs.map(_._2).min))
    }

  test("fused scores, list counts and best ranks match the integer reference") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
    val b = Seq((3L, 1L), (5L, 2L), (1L, 3L))
    val c = Seq((5L, 1L), (2L, 2L))
    val got = SignalFusion.rrfFuse(
      Seq(a.toDF("id", "rank"), b.toDF("id", "rank"), c.toDF("id", "rank")),
      "id", "rank", kRrf = 60, topK = 100)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    val exp = reference(Seq(a, b, c), 60L)
    assert(got.toMap == exp)
    // ordering: fused desc, then id asc
    val sorted = exp.toSeq.sortBy { case (id, (s, _, _)) => (-s, id) }.map(_._1)
    assert(got.map(_._1).toSeq == sorted)
  }

  test("an item ranked first on two lists beats an item ranked first on one") {
    val a = Seq((10L, 1L), (11L, 2L))
    val b = Seq((10L, 1L), (12L, 2L))
    val top = SignalFusion.rrfFuse(Seq(a.toDF("id", "rank"), b.toDF("id", "rank")),
      "id", "rank", kRrf = 60, topK = 1).collect().head
    assert(top.getLong(0) == 10L && top.getLong(2) == 2L)
  }

  test("exact integer ties break on id; topK truncates after the tie order") {
    // identical single-list ranks ⇒ identical fused scores
    val a = Seq((7L, 5L), (3L, 5L), (9L, 5L))
    val got = SignalFusion.rrfFuse(Seq(a.toDF("id", "rank")), "id", "rank",
      kRrf = 0, topK = 2).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 7L))
  }

  test("bounds are enforced") {
    val df = Seq((1L, 1L)).toDF("id", "rank")
    intercept[IllegalArgumentException] {
      SignalFusion.rrfFuse(Seq.empty, "id", "rank")
    }
    intercept[IllegalArgumentException] {
      SignalFusion.rrfFuse(Seq(df), "id", "rank", kRrf = -1)
    }
    intercept[IllegalArgumentException] {
      SignalFusion.rrfFuse(Seq(df), "id", "rank", topK = 0)
    }
  }
}
