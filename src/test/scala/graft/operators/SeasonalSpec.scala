package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** weekdayAnomalies contracts: low-median/MAD order statistics per
  * (series, isodow), the strict Hampel flag on a zero-MAD baseline, and
  * partitioning independence of the exact-integer report. */
class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: String, n: Int): Seq[(String, Timestamp)] =
    (1 to n).map(i => ("a", Timestamp.valueOf(s"2024-01-$day 0$i:00:00")))

  // Mondays Jan 1/8/15 with 2,2,8 events; Tuesdays Jan 2/9/16 with 3,3,3
  private def events =
    (ev("01", 2) ++ ev("08", 2) ++ ev("15", 8) ++
      ev("02", 3) ++ ev("09", 3) ++ ev("16", 3)).toDF("t", "ts")

  test("low-median baseline, MAD, and the zero-MAD strict flag") {
    val out = Seasonal.weekdayAnomalies(events, col("t"), col("ts"), 3)
      .orderBy("day").collect()
    val byDay = out.map(r => r.getDate(1).toString ->
      (r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(7)))
      .toMap
    // Mondays: counts (2,2,8) → med 2 (low-median), devs (0,0,6) → mad 0;
    // only Jan 15's dev 6 > 3·0 flags
    assert(byDay("2024-01-01") == (1, 2L, 2L, 0L, false))
    assert(byDay("2024-01-08") == (1, 2L, 2L, 0L, false))
    assert(byDay("2024-01-15") == (1, 8L, 2L, 0L, true))
    // Tuesdays: constant 3 → dev 0, never flagged (strict >)
    assert(byDay("2024-01-02") == (2, 3L, 3L, 0L, false))
    assert(byDay("2024-01-16") == (2, 3L, 3L, 0L, false))
  }

  test("even group size takes the LOWER middle order statistic") {
    // four Mondays with counts 1,2,5,9 → pos (4+1) div 2 = 2 → med 2
    val e = (ev("01", 1) ++ ev("08", 2) ++ ev("15", 5) ++ ev("22", 9))
      .toDF("t", "ts")
    val med = Seasonal.weekdayAnomalies(e, col("t"), col("ts"))
      .select("med").distinct().head().getLong(0)
    assert(med == 2L)
  }

  test("report is partitioning-independent") {
    val a = Seasonal.weekdayAnomalies(events, col("t"), col("ts"))
      .orderBy("day").collect().toSeq
    val b = Seasonal.weekdayAnomalies(events.repartition(11), col("t"), col("ts"))
      .orderBy("day").collect().toSeq
    assert(a == b)
  }

  test("k must be positive") {
    assertThrows[IllegalArgumentException] {
      Seasonal.weekdayAnomalies(events, col("t"), col("ts"), 0)
    }
  }

  private def evN(day: Int, n: Int): Seq[(String, Timestamp)] =
    (1 to n).map(i =>
      ("a", Timestamp.valueOf(f"2024-01-$day%02d ${i % 24}%02d:30:00")))

  test("cusumChangepoints: a level shift accumulates past the threshold") {
    // days 1-5 count 2, days 6-10 count 6 → μ = 4, deviations ∓2.
    // prefix sums −2..−10 then back to 0:
    //   s_pos = pf − min(0, runmin pf) = 0×5 then 2,4,6,8,10
    //   s_neg = max(0, runmax pf) − pf = 2,4,6,8,10 then 8,6,4,2,0
    // at h = 7 the low plateau flags DOWN on days 4-6 and the recovery
    // flags UP on days 9-10 — both sides of the step are visible
    val e = (1 to 5).flatMap(d => evN(d, 2)) ++
      (6 to 10).flatMap(d => evN(d, 6))
    val out = Seasonal.cusumChangepoints(e.toDF("t", "ts"), col("t"),
      col("ts"), h = 7).orderBy("day").collect()
    assert(out.map(_.getLong(3)).toSeq ==
      Seq(0L, 0L, 0L, 0L, 0L, 2L, 4L, 6L, 8L, 10L), "s_pos trajectory")
    assert(out.map(_.getLong(4)).toSeq ==
      Seq(2L, 4L, 6L, 8L, 10L, 8L, 6L, 4L, 2L, 0L), "s_neg trajectory")
    assert(out.map(_.getBoolean(5)).toSeq ==
      Seq.fill(8)(false) ++ Seq(true, true), "up-flags on the recovery tail")
    assert(out.map(_.getBoolean(6)).toSeq ==
      Seq(false, false, false, true, true, true, false, false, false, false),
      "down-flags on the sustained low plateau")
  }

  test("cusumChangepoints: a constant series never flags") {
    val e = (1 to 8).flatMap(d => evN(d, 3))
    val out = Seasonal.cusumChangepoints(e.toDF("t", "ts"), col("t"),
      col("ts"), h = 1).collect()
    assert(out.forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L))
  }

  test("seasonalNaiveMase: weekly repetition scores 0; constant series is NULL") {
    // two identical weeks → every 7-lag error is 0 → MASE 0
    val weekly = (0 until 14).flatMap(i => evN(i + 1, 2 + (i % 7)))
    val r = Seasonal.seasonalNaiveMase(weekly.toDF("t", "ts"), col("t"),
      col("ts")).head()
    assert(r.getLong(1) == 14L && r.getLong(2) == 0L && r.getLong(3) == 7L)
    assert(r.getLong(6) == 0L, "perfect weekly repetition → MASE 0")
    // constant series: naive SAE 0 → ratio undefined → NULL
    val const = (1 to 10).flatMap(d => evN(d, 3))
    assert(Seasonal.seasonalNaiveMase(const.toDF("t", "ts"), col("t"),
      col("ts")).head().isNullAt(6))
  }
}
