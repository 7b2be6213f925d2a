package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hill tail-index + group-fairness audit (x229/x230's operators) on
  * hand-computable fixtures. */
class TailFairnessSpec extends SparkSpec {

  import spark.implicits._

  test("hillTailIndex: exact on a dyadic ladder") {
    // top-4 by value = {16, 8, 4, 2}; with k = 3: x_(k+1) = 2 and
    //   Σ ln(x_i/2) = ln8 + ln4 + ln2 = 6·ln2
    val df = Seq(16L, 8L, 4L, 2L, 1L, 1L, 1L).toDF("x")
    val r = CorpusStats.hillTailIndex(df, col("x"), k = 3).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 6.0 * math.log(2.0) / 3.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - 3.0 / (6.0 * math.log(2.0))) < 1e-6)
  }

  test("hillTailIndex: tie at the cut is value-multiset deterministic") {
    // five rows tie at 8 around the k+1 boundary — whichever physical rows
    // the TakeOrdered keeps, the value multiset (and hence the fold) is
    // identical
    val df = (Seq(32L, 16L) ++ Seq.fill(5)(8L) ++ Seq.fill(10)(1L)).toDF("x")
    val a = CorpusStats.hillTailIndex(df, col("x"), k = 4).collect().head
    val b = CorpusStats.hillTailIndex(df.repartition(7), col("x"), k = 4)
      .collect().head
    assert(a == b)
    assert(a.getLong(1) == 8L)
  }

  test("hillTailIndex: fewer than k+1 positive rows yields an all-NULL row") {
    // 3 positive rows with k = 3 → x_(k+1) does not exist; the guarded
    // element_at must NOT throw under ANSI, matching the oracle's
    // NULL-propagating arr[k+1]
    val df = Seq(16L, 8L, 4L, 0L, -2L).toDF("x")
    val r = CorpusStats.hillTailIndex(df, col("x"), k = 3).collect().head
    assert(r.getLong(0) == 3L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("hillTailIndex: a flat tail yields NULL alpha") {
    val df = Seq.fill(10)(5L).toDF("x")
    val r = CorpusStats.hillTailIndex(df, col("x"), k = 3).collect().head
    assert(r.getDouble(2) == 0.0d)
    assert(r.isNullAt(3))
  }

  test("fairnessAudit: exact ppm rates and gaps on a two-group fixture") {
    // group a: 4 rows, perfect classifier (2 pos, 2 neg) → tpr 1e6, fpr 0,
    //   pos_rate 500000. group b: 4 rows, predicts all positive → tpr 1e6,
    //   fpr 1e6, pos_rate 1e6.
    val df = Seq(
      ("a", true, true), ("a", true, true), ("a", false, false), ("a", false, false),
      ("b", true, true), ("b", true, true), ("b", true, false), ("b", true, false))
      .toDF("g", "p", "y")
    val rows = Evaluation.fairnessAudit(df, col("g"), col("p"), col("y"))
      .collect()
    assert(rows.length == 2)
    val a = rows(0)
    assert(a.getString(0) == "a" && a.getLong(3) == 500000L &&
      a.getLong(4) == 1000000L && a.getLong(5) == 0L &&
      a.getLong(6) == 1000000L)
    val b = rows(1)
    assert(b.getLong(3) == 1000000L && b.getLong(5) == 1000000L &&
      b.getLong(6) == 500000L)
    // dp gap = 1e6 − 5e5; eo gap = max(Δtpr, Δfpr) = max(0, 1e6)
    assert(a.getLong(7) == 500000L && a.getLong(8) == 1000000L)
  }

  test("fairnessAudit: single-class groups carry NULL tpr/fpr, gaps over non-null") {
    val df = Seq(
      ("a", true, true), ("a", false, true),   // all-positive group: fpr NULL
      ("b", false, false), ("b", true, false)) // all-negative group: tpr NULL
      .toDF("g", "p", "y")
    val rows = Evaluation.fairnessAudit(df, col("g"), col("p"), col("y"))
      .collect()
    val a = rows(0)
    val b = rows(1)
    assert(a.getLong(4) == 500000L && a.isNullAt(5))
    assert(b.isNullAt(4) && b.getLong(5) == 500000L)
    // tpr range over the one non-null value = 0; same for fpr → eo gap 0
    assert(a.getLong(8) == 0L)
  }
}
