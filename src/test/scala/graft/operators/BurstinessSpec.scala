package graft.operators

import graft.SparkSpec

/** termBurstiness: the exact zero-inclusive variance-to-mean algebra,
  * the df filter, and the Poisson-vs-bursty separation. */
class BurstinessSpec extends SparkSpec {
  import spark.implicits._

  test("vmr_ppm matches the zero-inclusive in-memory reference") {
    // 6 docs: "the" uniform (1 each), "kafka" bursty (4 in one doc, 1 in
    // another), "rare" below minDf
    val docs = Seq(
      (1L, "the kafka kafka kafka kafka"),
      (2L, "the a"), (3L, "the a"), (4L, "the a rare"),
      (5L, "the a"), (6L, "the a kafka"))
      .toDF("doc_id", "text")
    val rows = Vocabulary.termBurstiness(docs, "text", "doc_id",
      minDf = 2L, k = 10).collect()
    val byTerm = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(!byTerm.contains("rare")) // df 1 < minDf
    def refVmrPpm(counts: Seq[Long], n: Long): Long = {
      val s = counts.sum; val s2 = counts.map(c => c * c).sum
      (BigInt(1000000) * (BigInt(n) * s2 - BigInt(s) * s) /
        (BigInt(n) * s)).toLong
    }
    assert(byTerm("the") == ((6L, 6L, refVmrPpm(Seq.fill(6)(1L), 6L))))
    assert(byTerm("kafka") == ((5L, 2L, refVmrPpm(Seq(4L, 1L), 6L))))
    // uniform term: VMR = 0 exactly (every doc count equals the mean)
    assert(byTerm("the")._3 == 0L)
    // bursty term far above the Poisson line (VMR ≈ 2.57 ≫ 1)
    assert(byTerm("kafka")._3 > 2000000L)
    // ordering: vmr desc, term asc
    assert(rows.map(_.getString(0)).toSeq ==
      rows.sortBy(r => (-r.getLong(3), r.getString(0))).map(_.getString(0)).toSeq)
  }

  test("k caps the output after the df filter") {
    val docs = (1L to 8L).map(i => (i, s"w$i w$i common")).toDF("doc_id", "text")
    val rows = Vocabulary.termBurstiness(docs, "text", "doc_id",
      minDf = 1L, k = 3).collect()
    assert(rows.length == 3)
  }
}
