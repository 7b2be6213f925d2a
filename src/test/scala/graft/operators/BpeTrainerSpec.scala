package graft.operators

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: the same algorithm on a word-count map. */
  private def referenceMerges(
      counts: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Seq[String], Long] =
      counts.map { case (w, c) => w.map(_.toString).toSeq -> c }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to numMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach { p =>
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
        }
      }
      if (pairCounts.nonEmpty) {
        val (a, b) = pairCounts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += ((a, b))
        vocab = vocab.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toSeq -> c
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    merges.toSeq
  }

  private val sennrich = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
  private def corpusDf(parts: Int) = {
    val words = sennrich.toSeq.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
    // spread words across rows so the vocabulary aggregation actually reduces
    words.grouped(3).map(_.mkString(" ")).toSeq.toDF("text").repartition(parts)
  }

  test("learns the classic Sennrich merge sequence, equal to the reference") {
    val merges = BpeTrainer.learnMerges(corpusDf(4), "text", numMerges = 6)
    val expected = referenceMerges(sennrich, 6)
    assert(merges == expected, s"got $merges expected $expected")
    // the canonical first merges: ('e','s') then ('es','t') — 9 weighted
    // occurrences each from newest+widest
    assert(merges.take(2) == Seq(("e", "s") -> (), ("es", "t") -> ()).map(_._1))
  }

  test("encode: learned merges re-segment the training words canonically") {
    val merges = BpeTrainer.learnMerges(corpusDf(4), "text", numMerges = 6)
    val out = BpeTrainer.encode(
      Seq((1L, "newest lowest"), (2L, ""), (3L, null.asInstanceOf[String]))
        .toDF("id", "text"),
      "text", merges)
      .collect().map(r =>
        r.getAs[Long]("id") ->
          r.getSeq[String](r.fieldIndex("tokens")).toList).toMap

    // reference greedy encode with the same ranks
    val ranks = merges.zipWithIndex.toMap
    def ref(w: String): Seq[String] = {
      var syms = w.map(_.toString).toVector
      var go = true
      while (go && syms.length >= 2) {
        val cands = syms.zip(syms.drop(1)).zipWithIndex
          .flatMap { case (p, i) => ranks.get(p).map(r => (r, i)) }
        if (cands.isEmpty) go = false
        else {
          val (_, i) = cands.min
          syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
        }
      }
      syms
    }
    assert(out(1L) == ref("newest") ++ ref("lowest"), out(1L).toString)
    // 'newest' was IN training: it must compress well (est/ne/we merges)
    assert(ref("newest").length <= 3, ref("newest").toString)
    assert(out(2L).isEmpty && out(3L).isEmpty)
  }

  test("distributed delta path: long budget matches the reference through exhaustion") {
    // 24 requested merges > the 16 possible on this corpus: the incremental
    // pair-count maintenance must stay exact across EVERY round (a drifted
    // delta shows up as a wrong argmax somewhere in the sequence) and the
    // empty pair table must stop the loop like the full recount did
    val dist = BpeTrainer.learnMerges(corpusDf(5), "text", numMerges = 24,
      localVocabThreshold = 0)
    val expected = referenceMerges(sennrich, 24)
    assert(dist == expected, s"got $dist expected $expected")
    assert(dist.length < 24, "corpus must exhaust before the budget")
    // and the local path agrees on the same long budget
    assert(BpeTrainer.learnMerges(corpusDf(2), "text", numMerges = 24) == expected)
  }

  test("merge table is deterministic across partition layouts and early-stops") {
    val a = BpeTrainer.learnMerges(corpusDf(1), "text", numMerges = 4)
    val b = BpeTrainer.learnMerges(corpusDf(7), "text", numMerges = 4)
    assert(a == b)
    // distributed loop (cutover disabled) produces the identical sequence
    val dist = BpeTrainer.learnMerges(corpusDf(3), "text", numMerges = 4,
      localVocabThreshold = 0)
    assert(dist == a, s"distributed $dist != local $a")
    // a single 2-char word exhausts after one merge
    val tiny = Seq("ab ab").toDF("text")
    val m = BpeTrainer.learnMerges(tiny, "text", numMerges = 10)
    assert(m == Seq(("a", "b")))
  }

  test("non-BMP symbols: identical merge sequence across the local/distributed cutover") {
    // U+E000 (private use, UTF-8 EE 80 80) vs U+1F600 😀 (UTF-8 F0 9F 98 80):
    // Java's UTF-16 code-unit compare puts 😀 (lead surrogate 0xD83D) BEFORE
    // \uE000, but Spark's UTF8String byte compare puts \uE000 first — a tie
    // between their pairs is decided OPPOSITELY by the two orderings, so this
    // corpus catches any collation drift between the driver loop and the
    // distributed loop. Code-point symbols also mean the emoji survives
    // UTF8String round-trips (a char-level split would leave lone surrogates,
    // which Java's UTF-8 encoder mangles to '?').
    val docs = Seq("\uE000z \uE000z \uE000z", "😀z 😀z 😀z")
      .toDF("text")
    val local = BpeTrainer.learnMerges(docs, "text", numMerges = 4)
    val dist = BpeTrainer.learnMerges(docs, "text", numMerges = 4,
      localVocabThreshold = 0)
    assert(local == dist, s"local $local != distributed $dist")
    // both counts tie at 3: UTF-8 byte order must decide (EE.. < F0..)
    assert(local == Seq(("\uE000", "z"), ("😀", "z")), s"got $local")
    // serving side segments the emoji word with the learned merges intact
    val enc = BpeTrainer.encode(Seq("😀z").toDF("text"), "text", local)
      .select("tokens").head().getSeq[String](0)
    assert(enc == Seq("😀z"), s"got $enc")
  }
}
