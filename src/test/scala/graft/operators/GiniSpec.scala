package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** sourceConcentration must compute the exact integer-ppm Gini of
  * per-source mass — verified against the sorted-sum definition. */
class GiniSpec extends SparkSpec {
  import spark.implicits._

  private def reference(masses: Seq[Long]): (Long, Long, Long, Long) = {
    val xs = masses.sorted
    val n = BigInt(xs.size); val tot = xs.map(BigInt(_)).sum
    val six = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = ((BigInt(2) * six - (n + 1) * tot) * 1000000) / (n * tot)
    (xs.size.toLong, tot.toLong, gini.toLong, (BigInt(xs.max) * 1000000 / tot).toLong)
  }

  private def run(rows: Seq[(String, Long)]): (Long, Long, Long, Long) = {
    val r = CorpusStats.sourceConcentration(
      rows.toDF("source", "w"), col("source"), col("w")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("uniform masses give Gini 0; a dominant head drives it toward 1") {
    val uniform = Seq("a", "b", "c", "d").map(s => (s, 100L))
    assert(run(uniform) == ((4L, 400L, 0L, 250000L)))
    val skewed = Seq(("a", 1L), ("b", 1L), ("c", 1L), ("d", 997L))
    val got = run(skewed)
    assert(got == reference(skewed.map(_._2)).copy(), s"got $got")
    assert(got._3 > 700000L, "a 99.7% head must read as near-max inequality")
    assert(got._4 == 997000L)
  }

  test("per-doc rows aggregate to per-source masses before ranking; " +
    "a single source is perfectly equal") {
    val docs = Seq(("a", 10L), ("a", 20L), ("b", 30L), ("c", 15L), ("c", 15L))
    assert(run(docs) == reference(Seq(30L, 30L, 30L)))
    assert(run(docs)._3 == 0L, "equal per-source totals → Gini 0")
    assert(run(Seq(("solo", 42L))) == ((1L, 42L, 0L, 1000000L)))
  }
}
