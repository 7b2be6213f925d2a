package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** boxCoxScan contracts: log-normal data selects λ=0, linear-normal data
  * selects λ=1, non-positive values are dropped-and-counted, constant
  * input yields NULL log-likelihoods. */
class BoxCoxSpec extends SparkSpec {
  import spark.implicits._

  test("log-normal sample selects the log transform (λ=0)") {
    // v = round(e^z) for z symmetric around 4: exactly normal in ln-space
    val zs = Seq(2.0, 3.0, 3.5, 4.0, 4.0, 4.0, 4.5, 5.0, 6.0)
    val vs = zs.flatMap(z => Seq.fill(3)(math.rint(math.exp(z)).toLong))
    val out = Evaluation.boxCoxScan(vs.toDF("v"), col("v")).collect()
    assert(out.length == 5)
    val best = out.filter(_.getBoolean(4)).map(_.getDouble(0))
    assert(best.toSeq == Seq(0.0), s"expected λ=0 best, got ${best.toSeq}")
  }

  test("already-normal sample selects the identity (λ=1)") {
    val vs = Seq(100L, 110L, 120L, 120L, 125L, 130L, 130L, 140L, 150L)
    val out = Evaluation.boxCoxScan(vs.toDF("v"), col("v")).collect()
    val best = out.filter(_.getBoolean(4)).map(_.getDouble(0))
    assert(best.toSeq == Seq(1.0), s"expected λ=1 best, got ${best.toSeq}")
  }

  test("non-positive values are dropped and counted, never transformed") {
    val vs = Seq(-5L, 0L, 3L, 9L, 27L, 81L)
    val out = Evaluation.boxCoxScan(vs.toDF("v"), col("v")).collect()
    assert(out.forall(_.getLong(1) == 4L))
    assert(out.forall(_.getLong(2) == 2L))
    assert(out.forall(!_.isNullAt(3)))
  }

  test("constant or tiny input → NULL log-likelihood, nothing is best") {
    val const = Seq(7L, 7L, 7L).toDF("v")
    val out = Evaluation.boxCoxScan(const, col("v")).collect()
    assert(out.forall(_.isNullAt(3)))
    assert(out.forall(!_.getBoolean(4)))
    val one = Seq(5L).toDF("v")
    assert(Evaluation.boxCoxScan(one, col("v")).collect().forall(_.isNullAt(3)))
  }

  test("hand-computed log-likelihood at λ=1") {
    // v ∈ {1, 3}: t = v−1 ∈ {0, 2}; σ² = 1; ll = −0.5·2·ln(1) + 0 = 0
    val out = Evaluation.boxCoxScan(Seq(1L, 3L).toDF("v"), col("v"))
      .where(col("lambda") === 1.0).collect().head
    assert(out.getDouble(3) == 0.0d)
  }
}
