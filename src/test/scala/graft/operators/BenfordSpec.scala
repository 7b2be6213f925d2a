package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** benfordReport: exact integer counts, the literal expected-ppm table,
  * and the ppm-scaled χ² contribution algebra. */
class BenfordSpec extends SparkSpec {
  import spark.implicits._

  test("expected ppm constants are the Benford masses and sum to 10^6") {
    assert(DataQuality.benfordPpm.sum == 1000000L)
    for ((p, i) <- DataQuality.benfordPpm.zipWithIndex) {
      val exact = math.log10(1.0 + 1.0 / (i + 1)) * 1e6
      assert(math.abs(p - exact) < 1.0, s"digit ${i + 1}")
    }
  }

  test("digit counts, zero-filled digits, and exact chi2_ppm") {
    // 1 appears 3x (1.5, 10.2, 199), 9 appears 1x, others absent
    val df = Seq(1.5, 10.2, 199.0, 9.99, 0.3).toDF("v") // 0.3 < 1 dropped
    val rows = DataQuality.benfordReport(df, col("v")).collect()
    assert(rows.map(_.getString(0)).toSeq == (1 to 9).map(_.toString))
    val byDigit = rows.map(r => r.getString(0) -> r).toMap
    assert(byDigit("1").getLong(1) == 3L)
    assert(byDigit("9").getLong(1) == 1L)
    assert(byDigit("2").getLong(1) == 0L)
    // chi2_ppm = (10^6·obs − n·ppm)^2 div (n·ppm), n = 4
    for (d <- 1 to 9) {
      val obs = byDigit(d.toString).getLong(1)
      val ppm = DataQuality.benfordPpm(d - 1)
      val num = BigInt(1000000L * obs - 4L * ppm).pow(2)
      assert(byDigit(d.toString).getLong(3) == (num / (BigInt(4) * ppm)).toLong, s"d=$d")
    }
  }

  test("empty input keeps all 9 digits with observed 0 and null chi2") {
    val rows = DataQuality.benfordReport(
      Seq.empty[Double].toDF("v"), col("v")).collect()
    assert(rows.length == 9)
    assert(rows.forall(r => r.getLong(1) == 0L && r.isNullAt(3)))
  }

  test("a Benford-distributed sample yields small chi2 everywhere") {
    // deterministic sample following the Benford CDF exactly in counts
    val vals = DataQuality.benfordPpm.zipWithIndex.flatMap { case (p, i) =>
      Seq.fill((p / 1000L).toInt)((i + 1) * 100.0 + i)
    }
    val rows = DataQuality.benfordReport(vals.toDF("v"), col("v")).collect()
    // counts are ⌊ppm/1000⌋, so each digit is off by < 1 of ~n·p ≈ 46…301
    // — contributions stay ≪ 1 (χ² in ppm < 2·10⁴)
    assert(rows.forall(r => r.getLong(3) < 20000L),
      rows.map(r => s"${r.getString(0)}:${r.getLong(3)}").mkString(","))
  }
}
