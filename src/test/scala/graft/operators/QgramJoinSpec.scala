package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** qgramJoin must be an EXACT edit-distance join: identical to brute-force
  * all-pairs Levenshtein, with candidates generated only through the
  * bag-gram count filter + the short-string length branch. */
class QgramJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(
      l: Seq[(Long, String)], r: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (li, lv) <- l; (ri, rv) <- r
      dist = lev(lv, rv) if dist <= d
    } yield (li, ri, dist.toLong)).toSet

  test("q-gram join equals brute force on mutated words, incl. repeated grams") {
    val rnd = new scala.util.Random(31)
    val alphabet = "abcdef"
    def word(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString
    val base = (0L until 40L).map(i => (i, word(6 + rnd.nextInt(8))))
    def mutate(s: String): String = {
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.take(i) + s.drop(i + 1) // delete
        case 1 => s.take(i) + alphabet(rnd.nextInt(6)) + s.drop(i) // insert
        case _ => s.take(i) + alphabet(rnd.nextInt(6)) + s.drop(i + 1) // sub
      }
    }
    val dirty = base.map { case (i, s) => (i + 1000L, mutate(mutate(s))) }
    val ldf = base.toDF("id", "v")
    val rdf = dirty.toDF("id", "v")
    for (d <- Seq(1, 2)) {
      val got = FuzzyLinkage.qgramJoin(ldf, rdf, "id", "v", "id", "v", d, q = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == brute(base, dirty, d), s"maxDist=$d")
    }
    assert(brute(base, dirty, 2).nonEmpty, "fixture produced no close pairs")
  }

  test("short strings below the count-filter floor still join exactly") {
    // len ≤ q−1+d·q = 5 at q=2,d=2: the gram filter is vacuous here — the
    // length-bucket branch must recover pairs sharing zero grams
    val l = Seq((1L, "ab"), (2L, "abc"), (3L, "hello"), (4L, "x"))
      .toDF("id", "v")
    val r = Seq((10L, "cd"), (11L, "abd"), (12L, "hallo"), (13L, "xy"), (14L, ""))
      .toDF("id", "v")
    val got = FuzzyLinkage.qgramJoin(l, r, "id", "v", "id", "v", 2, q = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val expect = brute(Seq((1L, "ab"), (2L, "abc"), (3L, "hello"), (4L, "x")),
      Seq((10L, "cd"), (11L, "abd"), (12L, "hallo"), (13L, "xy"), (14L, "")), 2)
    assert(got == expect, s"got $got expect $expect")
    // "ab"→"cd" is dist 2 with ZERO shared grams: the hard case must be in
    assert(got.contains((1L, 10L, 2L)))
  }

  test("maxDist 0 degenerates to exact equality join") {
    val l = Seq((1L, "same"), (2L, "other")).toDF("id", "v")
    val r = Seq((7L, "same"), (8L, "word")).toDF("id", "v")
    val got = FuzzyLinkage.qgramJoin(l, r, "id", "v", "id", "v", 0)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(got == Set((1L, 7L, 0L)))
  }
}
