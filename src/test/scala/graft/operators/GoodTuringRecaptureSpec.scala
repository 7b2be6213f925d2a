package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Simple Good–Turing table + Chapman capture–recapture (x234/x235) on
  * hand-computable fixtures. */
class GoodTuringRecaptureSpec extends SparkSpec {

  import spark.implicits._

  test("goodTuringTable: exact spectrum on a 6-token corpus") {
    // counts: a=3, b=2, c=1 → N=6, N1=N2=N3=1
    val df = Seq("a a a b b c").toDF("text")
    val out = CorpusStats.goodTuringTable(df, "text", maxR = 4).collect()
    assert(out.length == 4)
    val r1 = out(0)
    // r* (r=1) = 2·N2/N1 = 2.0 → 2,000,000 ppm; p0 = N1/N = 1/6
    assert(r1.getLong(1) == 1L && r1.getLong(2) == 1L)
    assert(r1.getLong(3) == 2000000L)
    assert(r1.getLong(4) == 166666L && r1.getLong(5) == 166666L)
    // r* (r=2) = 3·N3/N2 = 3.0; r* (r=3) = 4·N4/N3 = 0 (N4 = 0)
    assert(out(1).getLong(3) == 3000000L)
    assert(out(2).getLong(3) == 0L)
    // r = 4: no terms seen 4 times → NULL r*, zero mass
    assert(out(3).getLong(1) == 0L && out(3).isNullAt(3) &&
      out(3).getLong(4) == 0L)
  }

  test("goodTuringTable: empty/whitespace corpus yields NULL masses, no ANSI error") {
    // zero tokens → n_tokens is NULL (empty sum); the guarded divisions
    // must yield NULL rows instead of an ANSI divide error
    val df = Seq("   ", "\t", null.asInstanceOf[String]).toDF("text")
    val out = CorpusStats.goodTuringTable(df, "text", maxR = 3).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getLong(1) == 0L && r.isNullAt(3))
      assert(r.isNullAt(4) && r.isNullAt(5))
    }
  }

  test("captureRecapture: the textbook Chapman estimate") {
    // A sees {k1,k2,k3}, B sees {k2,k3,k4,k5} → m=2, union=5,
    // Chapman = (4·5) div 3 − 1 = 5 → unseen = 0
    val df = Seq(
      ("k1", 0L), ("k2", 0L), ("k3", 0L),
      ("k2", 1L), ("k3", 1L), ("k4", 1L), ("k5", 1L))
      .toDF("key", "slice")
    val r = CorpusStats.captureRecapture(df, col("key"),
      col("slice") === 0L).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 4L &&
      r.getLong(2) == 2L && r.getLong(3) == 5L)
    assert(r.getLong(4) == 5L && r.getLong(5) == 0L)
  }

  test("captureRecapture: zero overlap gives the degenerate Chapman bound") {
    val df = Seq(("a", 0L), ("b", 1L)).toDF("key", "slice")
    val r = CorpusStats.captureRecapture(df, col("key"),
      col("slice") === 0L).collect().head
    // (1+1)(1+1) div 1 − 1 = 3: at least one unseen key is implied
    assert(r.getLong(2) == 0L && r.getLong(4) == 3L && r.getLong(5) == 1L)
  }
}
