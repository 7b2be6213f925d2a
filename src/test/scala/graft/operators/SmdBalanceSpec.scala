package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SMD covariate-balance audit (x240's operator) on hand-computable
  * fixtures. */
class SmdBalanceSpec extends SparkSpec {

  import spark.implicits._

  test("smd: exact on a shifted two-arm fixture") {
    // control x = {0, 2}: mean 1, var 1; treated x = {2, 4}: mean 3, var 1
    // → smd = (3 − 1)/√((1+1)/2) = 2.0. y is identical in both arms.
    val df = Seq(
      (false, 0.0, 5.0), (false, 2.0, 7.0),
      (true, 2.0, 5.0), (true, 4.0, 7.0))
      .toDF("t", "x", "y")
    val rows = Evaluation.smdBalance(df, col("t"),
      Seq("x" -> col("x"), "y" -> col("y"))).collect()
    assert(rows.length == 2)
    val x = rows(0)
    assert(x.getString(0) == "x" && x.getLong(1) == 2L && x.getLong(2) == 2L)
    assert(x.getDouble(3) == 1.0 && x.getDouble(4) == 3.0)
    assert(x.getDouble(5) == 1.0 && x.getDouble(6) == 1.0)
    assert(x.getDouble(7) == 2.0)
    val y = rows(1)
    assert(y.getDouble(7) == 0.0) // balanced covariate
  }

  test("an empty arm and a zero-variance covariate yield NULLs, no ANSI error") {
    val oneArm = Seq((true, 1.0), (true, 2.0)).toDF("t", "x")
    val r1 = Evaluation.smdBalance(oneArm, col("t"), Seq("x" -> col("x")))
      .collect().head
    assert(r1.getLong(1) == 0L && r1.isNullAt(3) && r1.isNullAt(5) &&
      r1.isNullAt(7))
    val const = Seq((false, 3.0), (true, 3.0)).toDF("t", "x")
    val r2 = Evaluation.smdBalance(const, col("t"), Seq("x" -> col("x")))
      .collect().head
    assert(r2.getDouble(5) == 0.0 && r2.getDouble(6) == 0.0 && r2.isNullAt(7))
  }

  test("partition-layout invariant; null treatment/covariate rows excluded") {
    val rows = (0 until 60).map { i =>
      (if (i % 7 == 0) null else java.lang.Boolean.valueOf(i % 2 == 1),
        if (i % 11 == 0) null else java.lang.Double.valueOf(i.toDouble / 3.0))
    }
    val df = rows.toDF("t", "x")
    val a = Evaluation.smdBalance(df, col("t"), Seq("x" -> col("x"))).collect()
    val b = Evaluation.smdBalance(df.repartition(9), col("t"),
      Seq("x" -> col("x"))).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.head.getLong(1) + a.head.getLong(2) ==
      rows.count(r => r._1 != null && r._2 != null).toLong)
  }
}
