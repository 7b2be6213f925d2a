package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** finishPsi: the Laplace-smoothed PSI lens over the x123 drift state —
  * per-bin integer-ppm contributions and the order-free total. */
class PsiSpec extends SparkSpec {
  import spark.implicits._

  private def refPsi(bins: Seq[(String, Long, Long)]): Map[String, Long] = {
    val na = bins.map(_._2).sum; val nb = bins.map(_._3).sum
    val k = bins.size.toLong
    val per = bins.map { case (b, ca, cb) =>
      val pa = (ca + 1).toDouble / (na + k)
      val pb = (cb + 1).toDouble / (nb + k)
      b -> math.round(1e6 * (pa - pb) * math.log(pa / pb))
    }.toMap
    per + ("__total" -> per.values.sum)
  }

  test("per-bin ppm and total match the smoothed reference") {
    val bins = Seq(("a", 100L, 50L), ("b", 40L, 90L), ("c", 10L, 10L))
    val state = bins.toDF("bin", "cnt_a", "cnt_b")
    val got = Evaluation.finishPsi(state)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == refPsi(bins))
  }

  test("identical cohorts give ~0 everywhere; empty bins stay defined") {
    val bins = Seq(("a", 70L, 70L), ("b", 0L, 25L), ("c", 30L, 30L))
    val got = Evaluation.finishPsi(bins.toDF("bin", "cnt_a", "cnt_b"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("a") == refPsi(bins)("a"))
    assert(got("b") > 0L)        // an emptied bin is real drift
    assert(got == refPsi(bins))
  }

  test("an empty cohort yields null contributions") {
    val bins = Seq(("a", 10L, 0L), ("b", 5L, 0L))
    val rows = Evaluation.finishPsi(bins.toDF("bin", "cnt_a", "cnt_b"))
      .collect()
    assert(rows.forall(_.isNullAt(3)))
  }

  test("the PSI lens consumes the SAME state as the drift report") {
    val df = Seq((1, "x"), (2, "x"), (16, "x"), (17, "y"), (18, "y"))
      .toDF("day", "bin")
    val state = Evaluation.driftBinCounts(df, col("bin"), col("day") <= 15)
    val tvd = Evaluation.finishDrift(state).collect()
    val psi = Evaluation.finishPsi(state).collect()
    assert(tvd.map(_.getString(0)).sorted.toSeq ==
      psi.map(_.getString(0)).sorted.toSeq)
  }
}
