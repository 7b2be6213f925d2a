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
}
