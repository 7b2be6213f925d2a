package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** theilSen + crossCorrelation contracts: exact pairwise-slope medians
  * (truncated division, low-median order statistic), outlier immunity,
  * single-day degeneracy; lead–lag detection on a shifted pair of
  * series, gap-awareness, and pair ordering. */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def ev(series: String, day: Int, n: Int): Seq[(String, Timestamp)] =
    (1 to n).map(i =>
      (series, Timestamp.valueOf(f"2024-05-$day%02d ${i % 24}%02d:15:00")))

  test("theil–sen: slope of a clean ramp is exact; an outlier day cannot move it") {
    // days 1..5 with counts 2,4,6,8,10 → every pairwise slope = 2e6 ppm
    val clean = (1 to 5).flatMap(d => ev("a", d, 2 * d)).toDF("t", "ts")
    val r1 = Seasonal.theilSen(clean, col("t"), col("ts")).collect().head
    assert(r1.getLong(1) == 5L && r1.getLong(2) == 10L)
    assert(r1.getLong(3) == 2000000L)
    // corrupt day 3 to 50 events: 6 of 10 slopes still read 2e6 →
    // low-median at position (10+1) div 2 = 5 stays 2e6
    val dirty = ((1 to 5).filter(_ != 3).flatMap(d => ev("a", d, 2 * d)) ++
      ev("a", 3, 50)).toDF("t", "ts")
    val r2 = Seasonal.theilSen(dirty, col("t"), col("ts")).collect().head
    assert(r2.getLong(3) == 2000000L)
  }

  test("theil–sen: negative slopes truncate toward zero (div semantics)") {
    // days 1 and 4: slope = (1e6 · (1 − 8)) div 3 = −7000000 div 3 = −2333333
    val df = (ev("a", 1, 8) ++ ev("a", 4, 1)).toDF("t", "ts")
    val r = Seasonal.theilSen(df, col("t"), col("ts")).collect().head
    assert(r.getLong(2) == 1L && r.getLong(3) == -2333333L)
  }

  test("theil–sen: a single-day series reports 0 pairs and NULL slope") {
    val df = (ev("a", 1, 3) ++ ev("b", 1, 1) ++ ev("b", 2, 2)).toDF("t", "ts")
    val rows = Seasonal.theilSen(df, col("t"), col("ts")).collect()
    val a = rows.find(_.getString(0) == "a").get
    assert(a.getLong(1) == 1L && a.getLong(2) == 0L && a.isNullAt(3))
    val b = rows.find(_.getString(0) == "b").get
    assert(b.getLong(3) == 1000000L)
  }

  test("cross-correlation: a 2-day-shifted copy peaks at lag 2 with ccf 1.0") {
    // a on days 1..6 with counts 1,5,2,8,3,9; b = same pattern 2 days later
    val pat = Seq(1, 5, 2, 8, 3, 9)
    val a = pat.zipWithIndex.flatMap { case (n, i) => ev("a", i + 1, n) }
    val b = pat.zipWithIndex.flatMap { case (n, i) => ev("b", i + 3, n) }
    val out = Seasonal.crossCorrelation((a ++ b).toDF("t", "ts"),
      col("t"), col("ts"), maxLag = 3).collect()
    assert(out.forall(r => r.getString(0) == "a" && r.getString(1) == "b"))
    val atPeak = out.find(_.getLong(2) == 2L).get
    assert(atPeak.getLong(3) == 6L && atPeak.getDouble(4) == 1.0)
    // at lag 0 only 4 days overlap and the alignment is scrambled
    val at0 = out.find(_.getLong(2) == 0L).get
    assert(at0.getLong(3) == 4L && at0.getDouble(4) < 1.0)
  }

  test("cross-correlation: lag 0 on identical series reads 1.0; " +
    "pairs are ordered s1 < s2 only") {
    val a = (1 to 4).flatMap(d => ev("a", d, d))
    val b = (1 to 4).flatMap(d => ev("b", d, d))
    val out = Seasonal.crossCorrelation((a ++ b).toDF("t", "ts"),
      col("t"), col("ts"), maxLag = 1).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).distinct.toSeq ==
      Seq(("a", "b")))
    assert(out.find(_.getLong(2) == 0L).get.getDouble(4) == 1.0)
  }

  test("cross-correlation is partitioning-independent") {
    val df = ((1 to 9).flatMap(d => ev("a", d, (d * 3) % 5 + 1)) ++
      (1 to 9).flatMap(d => ev("b", d, (d * 7) % 4 + 1))).toDF("t", "ts")
    val x = Seasonal.crossCorrelation(df, col("t"), col("ts")).collect().toSeq
    val y = Seasonal.crossCorrelation(df.repartition(7), col("t"), col("ts"))
      .collect().toSeq
    assert(x == y)
  }

  test("crossCorrelation maxLag guard") {
    val df = ev("a", 1, 1).toDF("t", "ts")
    assertThrows[IllegalArgumentException] {
      Seasonal.crossCorrelation(df, col("t"), col("ts"), maxLag = -1)
    }
  }
}
