package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** acf contracts: hand-computed lag correlations on a linear ramp,
  * gap-awareness (a missing day contributes no pair — lags stay
  * CALENDAR lags, not sequence offsets), constant series → NULL,
  * degenerate pair counts → NULL, and the maxLag guard. */
class AcfSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: Int, n: Int): Seq[(String, Timestamp)] =
    (1 to n).map(i =>
      ("a", Timestamp.valueOf(f"2024-03-$day%02d ${i % 24}%02d:30:00")))

  test("linear ramp: every lag with >= 2 pairs reads 1.0") {
    // days 1..4 with counts 1,2,3,4
    val df = (ev(1, 1) ++ ev(2, 2) ++ ev(3, 3) ++ ev(4, 4)).toDF("t", "ts")
    val out = Seasonal.acf(df, col("t"), col("ts"), maxLag = 3).collect()
    val m = out.map(r => r.getLong(1) -> (r.getLong(2),
      if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(m(1L) == (3L, 1.0)) // (1,2),(2,3),(3,4)
    assert(m(2L) == (2L, 1.0)) // (1,3),(2,4)
    assert(m(3L) == (1L, null)) // single pair: undefined
  }

  test("calendar gaps contribute no pair — lag is days, not row offset") {
    // days 1, 2, 4: lag1 = {(d1,d2)}, lag2 = {(d2,d4)}, lag3 = {(d1,d4)}
    val df = (ev(1, 1) ++ ev(2, 2) ++ ev(4, 4)).toDF("t", "ts")
    val out = Seasonal.acf(df, col("t"), col("ts"), maxLag = 3).collect()
    assert(out.forall(_.getLong(2) == 1L)) // every lag: exactly one pair
    assert(out.forall(_.isNullAt(3)))
    assert(out.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("constant series: zero variance → NULL at every lag") {
    val df = (1 to 6).flatMap(d => ev(d, 3)).toDF("t", "ts")
    val out = Seasonal.acf(df, col("t"), col("ts"), maxLag = 2).collect()
    assert(out.length == 2 && out.forall(_.isNullAt(3)))
    assert(out.map(_.getLong(2)).toSeq == Seq(5L, 4L)) // pair counts real
  }

  test("series are independent and the output is ordered") {
    val df = ((ev(1, 1) ++ ev(2, 2) ++ ev(3, 3)) ++
      (ev(1, 5) ++ ev(2, 5)).map { case (_, ts) => ("b", ts) }).toDF("t", "ts")
    val out = Seasonal.acf(df, col("t"), col("ts"), maxLag = 1).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 1L)))
    assert(out.head.getDouble(3) == 1.0) // a ramps
    assert(out.last.isNullAt(3)) // b constant
  }

  test("report is partitioning-independent") {
    val df = (1 to 20).flatMap(d => ev(d, (d * 7) % 5 + 1)).toDF("t", "ts")
    val a = Seasonal.acf(df, col("t"), col("ts")).collect().toSeq
    val b = Seasonal.acf(df.repartition(7), col("t"), col("ts")).collect().toSeq
    assert(a == b)
  }

  test("maxLag guard") {
    val df = ev(1, 1).toDF("t", "ts")
    assertThrows[IllegalArgumentException] {
      Seasonal.acf(df, col("t"), col("ts"), maxLag = 0)
    }
  }
}
