package graft.operators

import java.sql.Timestamp

import scala.util.Random

import graft.SparkSpec

/** Randomized driver-side reference cross-checks for the corpus-report
  * operators: an independent pure-Scala implementation of each contract,
  * compared EXACTLY (including rounded doubles) on seeded pseudo-random
  * inputs — the fixture-independent correctness net behind the single
  * DuckDB-oracle operating point. */
class RandomizedReportsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def rnd4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  private def roundHalfUp4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def toks(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)

  test("gopherReport equals an independent Scala reference on random noisy documents") {
    val rng = new Random(1234)
    val words = Vector("the", "be", "to", "of", "and", "cat", "dog", "runs", "slowly",
      "42", "x9", "#", "...", "pneumonoultramicroscopic", "a", "zz")
    def doc(): String = {
      val n = 1 + rng.nextInt(40)
      val body = Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" ")
      rng.nextInt(4) match {
        case 0 => s"- bullet line\n$body\nplain tail..."
        case 1 => s"$body\n* item one\n• item two"
        case _ => body
      }
    }
    val docs = (1L to 60L).map(i => (i, doc()))
    val got = QualityRules.gopherRules(docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    docs.foreach { case (id, text) =>
      val t = toks(text)
      val nW = t.size
      val dw = math.max(nW, 1).toDouble
      val meanLen = t.map(_.length.toLong).sum.toDouble / dw
      val alphaR = t.count(_.exists(Character.isLetter)).toDouble / dw
      val symR = ("#|\\.\\.\\.".r.findAllIn(text).size).toDouble / dw
      val lines = text.split("\n", -1).toSeq
      val dl = math.max(lines.size, 1).toDouble
      val bulR = lines.count(l => l.startsWith("- ") || l.startsWith("* ") ||
        l.startsWith("• ")).toDouble / dl
      val ellR = lines.count(l => l.endsWith("...") || l.endsWith("…")).toDouble / dl
      val stops = QualityRules.GopherStopwords.count(t.contains)
      val r = got(id)
      assert(r.getAs[Long]("n_words") === nW.toLong, s"doc $id n_words")
      assert(r.getAs[Double]("mean_word_len") === rnd4(meanLen), s"doc $id mean")
      assert(r.getAs[Double]("alpha_word_ratio") === rnd4(alphaR), s"doc $id alpha")
      assert(r.getAs[Double]("symbol_ratio") === rnd4(symR), s"doc $id sym")
      assert(r.getAs[Double]("bullet_line_ratio") === rnd4(bulR), s"doc $id bullet")
      assert(r.getAs[Double]("ellipsis_line_ratio") === rnd4(ellR), s"doc $id ell")
      assert(r.getAs[Long]("stop_hits") === stops.toLong, s"doc $id stops")
      assert(r.getAs[Boolean]("pass") === (
        nW >= 50 && nW <= 100000 && meanLen >= 3.0 && meanLen <= 10.0 &&
        symR <= 0.1 && bulR <= 0.9 && ellR <= 0.3 && alphaR >= 0.8 && stops >= 2),
        s"doc $id pass")
    }
  }

  test("timeDecaySample equals the integer md5-threshold replay on random event times") {
    val rng = new Random(77)
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val halfLife = 5L * 24 * 3600 * 1000000 // 5 days in µs
    val events = (1L to 400L).map { i =>
      (i, new Timestamp(base + rng.nextInt(40 * 24 * 3600) * 1000L))
    }
    val got = MixtureSampling.timeDecaySample(
      events.toDF("event_id", "ts"), "ts", "event_id", halfLife)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("decay_epochs"), r.getAs[Double]("weight"))).toMap

    val maxUs = events.map(_._2.getTime).max * 1000L
    val expected = events.flatMap { case (id, ts) =>
      val k = math.min((maxUs - ts.getTime * 1000L) / halfLife, 33L)
      val thr = if (k >= 33) 0L else 4294967296L >> k
      val keep = k == 0L || md5hex(id.toString).substring(0, 8) < f"$thr%08x"
      if (keep) Some(id -> (k, thr.toDouble / 4294967296.0)) else None
    }.toMap
    assert(got === expected)
    assert(expected.size < events.size, "decay must actually drop rows")
  }

  test("bigramPmi equals the brute-force computation on a random corpus") {
    val rng = new Random(9)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val docs = (1L to 50L).map { i =>
      (i, Seq.fill(4 + rng.nextInt(20))(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val minCount = 3L
    val topK = 15
    val got = Vocabulary.bigramPmi(docs.toDF("doc_id", "text"), "text", minCount, topK)
      .collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("n_pair"), r.getAs[Double]("pmi"))).toSeq

    val tokenized = docs.map { case (_, text) => toks(text) }
    val uni = tokenized.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n1 = uni.values.sum
    val pairs = tokenized.flatMap(t => t.zip(t.drop(1)))
    val n2 = pairs.size.toLong
    val cb = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= minCount)
    val expected = cb.toSeq.map { case ((w1, w2), c) =>
      val pmi = roundHalfUp4(math.log(
        (c * 1.0 / n2) / ((uni(w1) * 1.0 / n1) * (uni(w2) * 1.0 / n1))))
      (w1, w2, c, pmi)
    }.sortBy { case (w1, w2, _, pmi) => (-pmi, w1, w2) }.take(topK)
    assert(got === expected)
  }

  test("NaiveBayes equals the brute-force smoothed-multinomial reference on random corpora") {
    val rng = new Random(4242)
    val vocabs = Map(
      "a" -> Vector("red", "blue", "green", "shared", "common"),
      "b" -> Vector("iron", "zinc", "lead", "shared", "common"),
      "c" -> Vector("oak", "pine", "elm", "shared", "common"))
    val labeled = (1L to 90L).map { i =>
      val cls = Seq("a", "b", "c")((i % 3).toInt)
      val v = vocabs(cls)
      (i, Seq.fill(2 + rng.nextInt(10))(v(rng.nextInt(v.size))).mkString(" "), cls)
    }
    val model = NaiveBayes.fit(labeled.toDF("doc_id", "text", "label"), "text", "label")
    val got = NaiveBayes.predict(labeled.toDF("doc_id", "text", "label"), model, "text", "doc_id")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("predicted"), r.getAs[Double]("score"))).toMap

    // reference: dense smoothed multinomial, direct formula
    val grid = labeled.flatMap { case (_, text, cls) => toks(text).map(cls -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val classes = labeled.map(_._3).distinct.sorted
    val vocab = grid.keys.map(_._2).toSet
    val ct = classes.map(c => c -> grid.collect { case ((`c`, _), n) => n }.sum).toMap
    val nd = labeled.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nTotal = labeled.size.toLong
    labeled.foreach { case (id, text, _) =>
      val t = toks(text)
      val m = t.count(vocab.contains).toLong
      val scores = classes.map { c =>
        val lp = math.log(nd(c) * 1.0 / nTotal)
        val ld = math.log((ct(c) + vocab.size).toDouble)
        val s = t.flatMap(tok => grid.get((c, tok)).map(n => math.log(n + 1.0))).sum
        c -> (lp - m * ld + s)
      }
      val (bestC, bestS) = scores.minBy { case (c, s) => (-s, c) }
      assert(got(id)._1 === bestC, s"doc $id predicted class")
      // the reference sums in doc order, Spark in partition order — allow
      // the rounding-grid half-step for summation-order ulp
      assert(math.abs(got(id)._2 - bestS) < 6e-5, s"doc $id score")
    }
  }

  test("oovRates equals the brute-force computation on a random corpus") {
    val rng = new Random(31)
    val vocab = Vector("red", "green", "blue", "cyan", "teal", "gray", "pink", "gold")
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(1 + rng.nextInt(15))(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }
    val k = 3
    val got = Vocabulary.oovRates(docs.toDF("doc_id", "text"), "text", "doc_id", k)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"), r.getAs[Double]("oov_rate")))
      .toMap

    val counts = docs.flatMap(d => toks(d._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val top = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(k).map(_._1).toSet
    val expected = docs.map { case (id, text) =>
      val t = toks(text)
      val oov = t.count(!top.contains(_)).toLong
      id -> (t.size.toLong, oov, rnd4(oov.toDouble / math.max(t.size, 1)))
    }.toMap
    assert(got === expected)
  }
}
