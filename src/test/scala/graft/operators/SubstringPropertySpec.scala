package graft.operators

import graft.SparkSpec

/** Randomized cross-check: duplicatedSpans vs a direct driver-side
  * reference implementation, on corpora drawn from a 4-word vocabulary so
  * window collisions are dense and every code path (multi-span docs,
  * self-repeats, touching islands, sub-window docs) is exercised by
  * chance rather than construction. */
class SubstringPropertySpec extends SparkSpec {
  import spark.implicits._

  private val w = 3

  /** Reference: the operator's contract computed the obvious way. */
  private def reference(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val windows = toks.toSeq.flatMap { case (id, ts) =>
      if (ts.length < w) Seq.empty
      else (0 to ts.length - w).map(p => (id, p, ts.slice(p, p + w).mkString(" ")))
    }
    val freq = windows.groupBy(_._3).view.mapValues(_.size).toMap
    val spansByDoc = windows
      .filter(x => freq(x._3) >= 2)
      .groupBy(_._1)
      .view.mapValues { ws =>
        // merge touching-or-overlapping [p, p+w-1] ranges in pos order
        val sorted = ws.map(_._2).sorted
        val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
        for (p <- sorted) {
          val e = p + w - 1
          if (spans.nonEmpty && p <= spans.last._2 + 1)
            spans(spans.length - 1) = (spans.last._1, math.max(spans.last._2, e))
          else spans += ((p, e))
        }
        spans.toSeq
      }.toMap
    spansByDoc.map { case (id, spans) =>
      id -> ((spans.size.toLong,
        spans.map(s => s._2 - s._1 + 1L).sum,
        toks(id).length.toLong))
    }
  }

  test("duplicatedSpans equals the driver-side reference on random corpora") {
    val vocab = Array("a", "b", "c", "d")
    for (trial <- 0 until 5) {
      val rng = new scala.util.Random(1000 + trial)
      val docs = (1L to 40L).map { id =>
        val n = 1 + rng.nextInt(12)
        id -> Seq.fill(n)(vocab(rng.nextInt(vocab.length))).mkString(" ")
      }
      val got = SubstringDedup.duplicatedSpans(
        docs.toDF("doc_id", "text"), "text", "doc_id", w)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val want = reference(docs)
      assert(got == want, s"trial $trial: got ${got.toSeq.sortBy(_._1)} " +
        s"want ${want.toSeq.sortBy(_._1)}")
    }
  }
}
