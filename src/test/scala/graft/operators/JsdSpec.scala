package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** finishJsd: the Laplace-smoothed Jensen–Shannon lens over the x123
  * drift state — symmetric, bounded per-bin ppm, order-free total. */
class JsdSpec extends SparkSpec {
  import spark.implicits._

  private def refJsd(bins: Seq[(String, Long, Long)]): Map[String, Long] = {
    val na = bins.map(_._2).sum; val nb = bins.map(_._3).sum
    val k = bins.size.toLong
    val per = bins.map { case (b, ca, cb) =>
      val pa = (ca + 1).toDouble / (na + k)
      val pb = (cb + 1).toDouble / (nb + k)
      val m = (pa + pb) / 2.0
      b -> math.round(1e6 * 0.5 *
        (pa * math.log(pa / m) + pb * math.log(pb / m)))
    }.toMap
    per + ("__total" -> per.values.sum)
  }

  test("per-bin ppm and total match the smoothed reference") {
    val bins = Seq(("a", 100L, 50L), ("b", 40L, 90L), ("c", 10L, 10L))
    val got = Evaluation.finishJsd(bins.toDF("bin", "cnt_a", "cnt_b"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == refJsd(bins))
  }

  test("symmetric in the cohorts — JSD(a,b) == JSD(b,a)") {
    val ab = Seq(("x", 80L, 20L), ("y", 20L, 80L), ("z", 5L, 45L))
    val ba = ab.map { case (b, ca, cb) => (b, cb, ca) }
    val g1 = Evaluation.finishJsd(ab.toDF("bin", "cnt_a", "cnt_b"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val g2 = Evaluation.finishJsd(ba.toDF("bin", "cnt_a", "cnt_b"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(g1 == g2)
  }

  test("identical cohorts read 0; the bin total stays under ln(2) ppm") {
    val same = Seq(("a", 70L, 70L), ("b", 30L, 30L))
    val got = Evaluation.finishJsd(same.toDF("bin", "cnt_a", "cnt_b"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got.values.forall(_ == 0L))
    // disjoint cohorts approach the ln 2 bound but never exceed it
    val disjoint = Seq(("a", 1000L, 0L), ("b", 0L, 1000L))
    val tot = Evaluation.finishJsd(disjoint.toDF("bin", "cnt_a", "cnt_b"))
      .collect().find(_.getString(0) == "__total").get.getLong(3)
    assert(tot > 600000L && tot <= math.round(1e6 * math.log(2.0)))
  }

  test("an empty cohort yields null contributions") {
    val rows = Evaluation.finishJsd(
      Seq(("a", 10L, 0L), ("b", 5L, 0L)).toDF("bin", "cnt_a", "cnt_b"))
      .collect()
    assert(rows.forall(_.isNullAt(3)))
  }

  test("the JSD lens consumes the SAME state as the TVD and PSI lenses") {
    val df = Seq((1, "x"), (2, "x"), (16, "x"), (17, "y"), (18, "y"))
      .toDF("day", "bin")
    val state = Evaluation.driftBinCounts(df, col("bin"), col("day") <= 15)
    val tvd = Evaluation.finishDrift(state).collect()
    val jsd = Evaluation.finishJsd(state).collect()
    assert(tvd.map(_.getString(0)).sorted.toSeq ==
      jsd.map(_.getString(0)).sorted.toSeq)
  }
}
