package graft.operators

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val w = 4

  // docA and docB share a verbatim 6-token run; docC is all-unique; docD
  // repeats a 4-token run within itself (self-duplication); docE is too
  // short to hold a window. Filler tokens are globally unique so no
  // accidental windows collide.
  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta ua1 ua2 ua3"),
    (2L, "ub1 ub2 alpha beta gamma delta epsilon zeta ub3"),
    (3L, "uc1 uc2 uc3 uc4 uc5 uc6 uc7"),
    (4L, "rep1 rep2 rep3 rep4 mid1 rep1 rep2 rep3 rep4"),
    (5L, "ue1 ue2 ue3")
  ).toDF("doc_id", "text")

  test("shared runs resolve to exact span boundaries; unique docs emit nothing") {
    val spans = SubstringDedup.duplicatedSpansDetail(docs, "text", "doc_id", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // docA: dup windows at pos 0,1,2 → one span [0, 5]
    // docB: same six tokens at offset 2 → span [2, 7]
    // docD: "rep1 rep2 rep3 rep4" occurs at pos 0 and pos 5 → [0,3], [5,8]
    assert(spans == Set((1L, 0L, 5L), (2L, 2L, 7L), (4L, 0L, 3L), (4L, 5L, 8L)),
      spans.toString)
  }

  test("per-doc report: span counts, token fractions, short docs excluded") {
    val rep = SubstringDedup.duplicatedSpans(docs, "text", "doc_id", w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(rep.keySet == Set(1L, 2L, 4L))
    assert(rep(1L) == ((1L, 6L, 9L, 0.6667)))
    assert(rep(2L) == ((1L, 6L, 9L, 0.6667)))
    assert(rep(4L) == ((2L, 8L, 9L, 0.8889)))
  }

  test("touching islands merge: a long shared run is one span, not many") {
    val run = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val pair = Seq((10L, run), (11L, s"pp1 pp2 $run")).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpansDetail(pair, "text", "doc_id", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((10L, 0L, 9L), (11L, 2L, 11L)), spans.toString)
  }

  test("dropDuplicatedSpans removes exactly the span tokens and passes unique docs through") {
    val out = SubstringDedup.dropDuplicatedSpans(docs, "text", "doc_id", w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("ua1 ua2 ua3", 9L, 6L)))
    assert(out(2L) == (("ub1 ub2 ub3", 9L, 6L)))
    assert(out(3L) == (("uc1 uc2 uc3 uc4 uc5 uc6 uc7", 7L, 0L)))
    assert(out(4L) == (("mid1", 9L, 8L)))
    assert(out(5L) == (("ue1 ue2 ue3", 3L, 0L)))
  }

  test("hot-window skew: one boilerplate window in 1000 docs stays correct") {
    // the 100 TB failure mode: a single window (cookie banner, license
    // header) repeated across a huge share of the corpus makes its hash a
    // hot join key. Correctness must hold regardless of how AQE splits it.
    val boiler = "this site uses cookies ok"
    val docs = (1L to 1000L).map(i => (i, s"u${i}a u${i}b $boiler u${i}c"))
      .toDF("doc_id", "text")
    val rep = SubstringDedup.duplicatedSpans(docs, "text", "doc_id", w)
      .collect()
    assert(rep.length == 1000)
    // every doc: exactly the 5-token boilerplate span [2, 6] (windows at
    // pos 2 and 3 merge; pos 0/1/4+ windows contain per-doc unique tokens)
    rep.foreach { r =>
      assert(r.getLong(1) == 1L && r.getLong(2) == 5L && r.getLong(3) == 8L,
        r.toString)
    }
  }

  test("reserved helper column names are guarded") {
    val bad = Seq((1L, "a b c d e", 0)).toDF("doc_id", "text", "__pos")
    val e = intercept[IllegalArgumentException] {
      SubstringDedup.duplicatedSpans(bad, "text", "doc_id", w)
    }
    assert(e.getMessage.contains("__pos"))
  }

  test("windowTokens below 2 is rejected") {
    intercept[IllegalArgumentException] {
      SubstringDedup.duplicatedSpans(docs, "text", "doc_id", 1)
    }
  }
}
