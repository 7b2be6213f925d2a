package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** holtLinear must run the exact Holt recurrence (l₀ = y₀, b₀ = 0) over
  * day-ordered observed counts — verified against a sequential Scala fold
  * with the identical arithmetic. */
class HoltSpec extends SparkSpec {
  import spark.implicits._

  private def reference(
      ys: Seq[Double], alpha: Double, beta: Double, horizon: Int)
    : (Double, Double, Double) = {
    var l = ys.head; var b = 0.0
    for (x <- ys.tail) {
      val l2 = alpha * x + (1.0 - alpha) * (l + b)
      val b2 = beta * (l2 - l) + (1.0 - beta) * b
      l = l2; b = b2
    }
    def r4(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    (r4(l), r4(b), r4(l + horizon.toDouble * b))
  }

  private def ev(series: String, day: Int, n: Int): Seq[(String, Timestamp)] =
    (0 until n).map(i =>
      (series, Timestamp.valueOf(f"2026-01-${day}%02d 0${i % 9}:00:00")))

  test("level/trend/forecast match the sequential reference; gaps are skipped") {
    // series a: counts 2,4,6,8 on days 1,2,4,7 (gaps at 3,5,6)
    val rows = ev("a", 1, 2) ++ ev("a", 2, 4) ++ ev("a", 4, 6) ++ ev("a", 7, 8) ++
      ev("b", 1, 5) // single-day series
    val df = rows.toDF("event_type", "ts")
    val got = Seasonal.holtLinear(df, col("event_type"), col("ts"),
      alpha = 0.5, beta = 0.3, horizon = 7)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val (la, ba, fa) = reference(Seq(2, 4, 6, 8), 0.5, 0.3, 7)
    assert(got("a")._1 == 4L)
    assert(math.abs(got("a")._2 - la) < 1e-9 && math.abs(got("a")._3 - ba) < 1e-9 &&
      math.abs(got("a")._4 - fa) < 1e-9, s"got ${got("a")}, exp ($la, $ba, $fa)")
    // single observation: level = y0, trend 0, forecast = y0
    assert(got("b") == ((1L, 5.0, 0.0, 5.0)))
  }

  test("a clean linear ramp forecasts ahead on trend") {
    // counts 1..10 on consecutive days: slope 1/day
    val rows = (1 to 10).flatMap(d => ev("r", d, d))
    val got = Seasonal.holtLinear(rows.toDF("event_type", "ts"),
      col("event_type"), col("ts"), alpha = 0.5, beta = 0.3, horizon = 7)
      .collect().head
    val forecast = got.getDouble(4)
    assert(forecast > 12.0 && forecast < 20.0,
      s"7-ahead forecast of a ramp ending at 10 should continue the trend, got $forecast")
    assert(got.getDouble(3) > 0.5, "trend must be clearly positive")
  }

  test("bounds are enforced") {
    val df = ev("a", 1, 1).toDF("event_type", "ts")
    intercept[IllegalArgumentException] {
      Seasonal.holtLinear(df, col("event_type"), col("ts"), alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Seasonal.holtLinear(df, col("event_type"), col("ts"), beta = 1.0)
    }
    intercept[IllegalArgumentException] {
      Seasonal.holtLinear(df, col("event_type"), col("ts"), horizon = 0)
    }
  }
}
