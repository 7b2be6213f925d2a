package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** coverageSelect must run the exact greedy max-coverage traversal:
  * argmax of uncovered-shingle gain with (gain desc, id asc) ties. */
class CoverageSelectSpec extends SparkSpec {
  import spark.implicits._

  private def reference(
      rows: Seq[(Long, Set[String])], k: Int): Seq[(Long, Long, Long)] = {
    var pool = rows.filter(_._2.nonEmpty)
    var covered = Set.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var stop = false
    for (_ <- 1 to k if !stop) {
      val gains = pool.map { case (id, sh) => (id, (sh -- covered).size.toLong) }
        .filter(_._2 > 0)
      if (gains.isEmpty) stop = true
      else {
        val (id, g) = gains.minBy { case (i, gg) => (-gg, i) }
        covered ++= pool.find(_._1 == id).get._2
        pool = pool.filter(_._1 != id)
        out += ((id, g, covered.size.toLong))
      }
    }
    out.toSeq
  }

  test("greedy coverage matches the in-memory reference on word sets") {
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 40).map(i => s"w$i")
    val rows = (0L until 30L).map { i =>
      val n = 3 + rnd.nextInt(10)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = rows.toDF("id", "text")
    val got = TrainingDataPipeline.coverageSelect(df, "text", "id",
      k = 5, shingleSize = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val sets = rows.map { case (id, t) => (id, t.split("\\s+").toSet) }
    // NOTE: reference covers covered_total as |covered| — gains are
    // distinct-new counts, so the running covered size equals sum(gain)
    assert(got == reference(sets, 5), s"got $got")
  }

  test("a doc fully covered by earlier picks is never selected; ties break on id") {
    val df = Seq(
      (10L, "a b c d e"),
      (11L, "a b c"), // subset of 10 — zero gain once 10 is picked
      (12L, "x y z"),
      (13L, "x y z") // identical to 12, higher id — never picked after 12
    ).toDF("id", "text")
    val got = TrainingDataPipeline.coverageSelect(df, "text", "id",
      k = 4, shingleSize = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // 10 first (5 shingles), then 12 (3), then nothing has positive gain
    assert(got == Seq((10L, 5L), (12L, 3L)), s"got $got")
  }

  test("empty corpus → contract schema; k bound enforced") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val out = TrainingDataPipeline.coverageSelect(empty, "text", "id", 3)
    assert(out.isEmpty && out.columns.toSeq ==
      Seq("rank", "doc_id", "gain_shingles", "covered_total"))
    intercept[IllegalArgumentException] {
      TrainingDataPipeline.coverageSelect(empty, "text", "id", 0)
    }
  }
}
