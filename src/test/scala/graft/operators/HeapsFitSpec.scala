package graft.operators

import graft.SparkSpec

/** CorpusStats.heapsLawFit — OLS on the log-log growth curve. */
class HeapsFitSpec extends SparkSpec {
  import spark.implicits._

  test("a corpus with vocab = tokens/2 in every prefix fits beta=1, K=0.5, r2=1") {
    // doc i: 10 fresh unique words + 10 repeats of doc 1's first word →
    // after every bucket, cumulative vocab is exactly half of cumulative
    // tokens, so the log-log points are collinear with slope 1
    val docs = (1 to 10).map { i =>
      val fresh = (1 to 10).map(j => s"w${i}_$j")
      val filler = if (i == 1) fresh else Seq.fill(10)("w1_1")
      val words = if (i == 1) fresh.flatMap(w => Seq(w, w)) else fresh ++ filler
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val r = CorpusStats.heapsLawFit(docs, "text", "doc_id",
      nBuckets = 10, extrapolateFactor = 100.0).collect()(0)
    assert(r.getAs[Long]("n_points") == 10L)
    assert(r.getAs[Double]("beta") == 1.0, r.toString)
    assert(r.getAs[Double]("k_coeff") == 0.5, r.toString)
    assert(r.getAs[Double]("r2") == 1.0, r.toString)
    assert(r.getAs[Long]("tokens_now") == 200L)
    assert(r.getAs[Long]("vocab_now") == 100L)
    assert(r.getAs[Long]("predicted_vocab_at_factor") == 10000L)
  }

  test("sublinear growth yields beta < 1 and an extrapolation above current vocab") {
    // real-ish shape: the shared filler vocabulary saturates early
    val rng = new scala.util.Random(11)
    val base = (1 to 40).map(i => s"common$i")
    val docs = (1 to 60).map { i =>
      val rare = if (i % 3 == 0) Seq(s"rare$i") else Nil
      (i.toLong, (Seq.fill(20)(base(rng.nextInt(base.size))) ++ rare).mkString(" "))
    }.toDF("doc_id", "text")
    val r = CorpusStats.heapsLawFit(docs, "text", "doc_id", nBuckets = 6).collect()(0)
    val beta = r.getAs[Double]("beta")
    assert(beta > 0.0 && beta < 1.0, s"expected sublinear beta, got $beta")
    assert(r.getAs[Long]("predicted_vocab_at_factor") > r.getAs[Long]("vocab_now"))
  }

  test("empty corpus → a single all-null-free row is not required; result is empty-safe") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // no fit points → the aggregation still returns one row with n_points=0
    val r = CorpusStats.heapsLawFit(empty, "text", "doc_id").collect()(0)
    assert(r.getAs[Long]("n_points") == 0L)
  }
}
