package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** jarqueBera / cupedReport / mdeReport contracts: hand-computed moments,
  * perfect-covariate CUPED, degenerate NULLs, literal-quantile MDE. */
class MomentTestsSpec extends SparkSpec {
  import spark.implicits._

  test("jarque–bera: symmetric three-point sample has skew 0 and the " +
    "hand-computed kurtosis") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a")).toDF("v", "g")
    val r = Evaluation.jarqueBera(df, col("v"), col("g")).collect().head
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.0d)
    // m2 = 2/3, m4 = 2/3 → excess kurtosis = 1.5 − 3 = −1.5
    assert(r.getDouble(3) == -1.5d)
    // jb = 3/6 · (0 + 2.25/4) = 0.28125
    assert(r.getDouble(4) == 0.2813d || math.abs(r.getDouble(4) - 0.28125) < 1e-4)
  }

  test("jarque–bera: right-skewed sample reports positive skewness; " +
    "constant group NULL") {
    val df = (Seq.fill(9)(1L) :+ 100L).map((_, "a")).toDF("v", "g")
    val r = Evaluation.jarqueBera(df, col("v"), col("g")).collect().head
    assert(r.getDouble(2) > 2.0d)
    val const = Seq((5L, "a"), (5L, "a")).toDF("v", "g")
    assert(Evaluation.jarqueBera(const, col("v"), col("g"))
      .collect().head.isNullAt(4))
  }

  test("cuped: a perfect pre-period covariate removes all variance") {
    val df = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("x", "y")
    val r = Evaluation.cupedReport(df, col("x"), col("y")).collect().head
    assert(r.getDouble(1) == 2.0d)      // theta
    assert(r.getDouble(3) == 0.0d)      // var_adj
    assert(r.getLong(4) == 1000000L)    // reduction = rho² = 1
  }

  test("cuped: an uninformative covariate reduces nothing") {
    // x constant → var_x = 0 → theta NULL; reduction NULL
    val flat = Seq((1L, 2L), (1L, 5L), (1L, 8L)).toDF("x", "y")
    val r = Evaluation.cupedReport(flat, col("x"), col("y")).collect().head
    assert(r.isNullAt(1) && r.isNullAt(4))
    // orthogonal covariate: cov = 0 → reduction 0, var_adj == var_y
    val orth = Seq((1L, 5L), (2L, 5L), (3L, 5L), (1L, 7L), (2L, 7L), (3L, 7L))
      .toDF("x", "y")
    val r2 = Evaluation.cupedReport(orth, col("x"), col("y")).collect().head
    assert(r2.getLong(4) == 0L)
    assert(r2.getDouble(2) == r2.getDouble(3))
  }

  test("mde: hand-computed at pooled p = 0.5 with equal tiny cohorts") {
    val df = Seq((true, true), (false, true), (true, false), (false, false))
      .toDF("s", "a")
    val r = Evaluation.mdeReport(df, col("s"), col("a")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 500000L)
    val expected = math.rint(
      (1.9599639845400545 + 0.8416212335729143) *
        math.sqrt(2.0 * 0.5 * 0.5 / 2.0) * 1e6).toLong
    assert(r.getLong(3) == expected)
  }

  test("ab readout: z and mde equal the standalone x172/x215 lenses; " +
    "the powered verdict compares observed effect to MDE") {
    val rows = (1 to 40).map(i => (i % 2 == 0, i % 5 == 0 || i % 2 == 0 && i % 3 == 0))
    val df = rows.toDF("a", "s")
    val r = Evaluation.abReadout(df, col("a"), col("s")).collect().head
    val z = Evaluation.twoProportionZ(df, col("a"), col("s")).collect().head
    val m = Evaluation.mdeReport(df, col("s"), col("a")).collect().head
    assert(r.getDouble(5) == z.getDouble(z.length - 1))
    assert(r.getLong(6) == m.getLong(3))
    assert(r.getBoolean(7) == (r.getLong(4) >= r.getLong(6)))
  }

  test("ab readout: a huge effect on a big-enough sample is powered") {
    val df = ((1 to 50).map(_ => (true, true)) ++
      (1 to 50).map(_ => (false, false))).toDF("a", "s")
    val r = Evaluation.abReadout(df, col("a"), col("s")).collect().head
    assert(r.getLong(4) == 1000000L)
    // all-success-in-A/all-fail-in-B: pooled p = 0.5 → MDE defined
    assert(!r.isNullAt(6) && r.getBoolean(7))
  }

  test("mde: all-success or empty cohort → NULL") {
    val all = Seq((true, true), (true, false)).toDF("s", "a")
    assert(Evaluation.mdeReport(all, col("s"), col("a"))
      .collect().head.isNullAt(3))
    val one = Seq((true, true), (false, true)).toDF("s", "a")
    assert(Evaluation.mdeReport(one, col("s"), col("a"))
      .collect().head.isNullAt(3))
  }
}
