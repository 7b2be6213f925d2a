package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cross-fitted DR off-policy (x241) + Fleiss' kappa (x242) on
  * hand-computable fixtures. */
class DrFleissSpec extends SparkSpec {

  import spark.implicits._

  test("drOffPolicy: hand-computed integers; DR hits the uniform truth") {
    // fit: a{2,4} → q̂(a)=3e6; b{10} → q̂(b)=1e7
    // eval: a{5}, b{8,12} → N=3, K=2, w(a)=1.5e6, w(b)=7.5e5
    // dm = (3e6+1e7) div 2 = 6.5e6; resw = (5e6−3e6)·1.5e6 + 0 = 3e12
    // corr = 3e12 div 3e6 = 1e6 → dr = 7.5e6 = uniform truth (5+10)/2
    val df = Seq(
      ("a", 2.0, true), ("a", 4.0, true), ("b", 10.0, true),
      ("a", 5.0, false), ("b", 8.0, false), ("b", 12.0, false))
      .toDF("act", "r", "fit")
    val row = Evaluation.drOffPolicy(df, col("act"), col("r"), col("fit"))
      .collect().head
    assert(row.getLong(0) == 3L && row.getLong(1) == 3L && row.getLong(2) == 2L)
    assert(row.getLong(3) == 6500000L)
    assert(row.getLong(4) == 1000000L)
    assert(row.getLong(5) == 7500000L)
    assert(row.getLong(6) == 7500000L) // exact weights → IPS agrees here
  }

  test("drOffPolicy: eval-only action falls back to the global fit mean") {
    // fit has only action a (mean 4e6); eval sees c → q̂(c) = 4e6
    val df = Seq(("a", 4.0, true), ("c", 9.0, false)).toDF("act", "r", "fit")
    val row = Evaluation.drOffPolicy(df, col("act"), col("r"), col("fit"))
      .collect().head
    // K=1, w(c)=1e6; dm = 4e6; resw = (9e6−4e6)·1e6 → corr 5e6 → dr 9e6
    assert(row.getLong(3) == 4000000L && row.getLong(4) == 5000000L &&
      row.getLong(5) == 9000000L)
  }

  test("drOffPolicy: partition-layout invariant") {
    val rows = (0 until 80).map(i =>
      ("act" + (i % 4), (i % 7).toDouble, i % 2 == 0))
    val df = rows.toDF("act", "r", "fit")
    val a = Evaluation.drOffPolicy(df, col("act"), col("r"), col("fit"))
      .collect().head
    val b = Evaluation.drOffPolicy(df.repartition(13), col("act"), col("r"),
      col("fit")).collect().head
    assert(a == b)
  }

  test("fleissKappa: perfect agreement is exactly 1e6 ppm") {
    val df = Seq(("x", "x", "x"), ("y", "y", "y"), ("x", "x", "x"))
      .toDF("r0", "r1", "r2")
    val row = LabelQa.fleissKappa(df, Seq(col("r0"), col("r1"), col("r2")))
      .collect().head
    assert(row.getLong(0) == 3L && row.getLong(2) == 1000000L)
    assert(row.getLong(4) == 1000000L)
  }

  test("fleissKappa: the two-item worked example, truncated toward zero") {
    // (x,x,y) + (x,y,y): S=4, D=12, E=18, F=36
    // P̄ = 333333 ppm, P̄e = 500000 ppm, κ = −1/3 → −333333
    val df = Seq(("x", "x", "y"), ("x", "y", "y")).toDF("r0", "r1", "r2")
    val row = LabelQa.fleissKappa(df, Seq(col("r0"), col("r1"), col("r2")))
      .collect().head
    assert(row.getLong(2) == 333333L)
    assert(row.getLong(3) == 500000L)
    assert(row.getLong(4) == -333333L)
  }

  test("fleissKappa: one category everywhere yields NULL; null rows drop") {
    val df = Seq(("x", "x", "x"), ("x", null, "x")).toDF("r0", "r1", "r2")
    val row = LabelQa.fleissKappa(df, Seq(col("r0"), col("r1"), col("r2")))
      .collect().head
    assert(row.getLong(0) == 1L)
    assert(row.isNullAt(4))
  }
}
