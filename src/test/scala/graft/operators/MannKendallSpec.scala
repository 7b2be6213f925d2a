package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** mannKendall: exact S, tie-corrected variance numerator, and the
  * continuity-corrected z — against a direct pairwise reference. */
class MannKendallSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-${day}%02d 10:00:00")

  /** events: one (series, day) row per event — counts are the per-day
    * event totals. */
  private def run(counts: Seq[(String, Int, Int)]) = {
    val rows = counts.flatMap { case (s, d, c) =>
      Seq.fill(c)((s, ts(d)))
    }.toDF("series", "t")
    Seasonal.mannKendall(rows, col("series"), col("t"), roundTo = 8)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
  }

  private def ref(ys: Seq[Long]): (Long, Long, Long, Option[Double]) = {
    val n = ys.size.toLong
    var s = 0L
    for (i <- ys.indices; j <- (i + 1) until ys.size)
      s += (ys(j) - ys(i)).sign
    val tt = ys.groupBy(identity).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val var18 = n * (n - 1) * (2 * n + 5) - tt
    val z = if (var18 <= 0) None else Some {
      val num = if (s > 0) s - 1.0 else if (s < 0) s + 1.0 else 0.0
      num / math.sqrt(var18 / 18.0)
    }
    (n, s, var18, z)
  }

  test("S, var18 and z match the pairwise reference") {
    val cases = Seq(
      Seq(1L, 2L, 3L, 4L, 5L, 6L),        // strict uptrend: S = n(n−1)/2
      Seq(9L, 7L, 5L, 5L, 3L, 1L),        // downtrend with a tie
      Seq(4L, 4L, 4L, 4L),                // all tied: var18 = 0 → null z
      Seq(2L, 9L, 1L, 8L, 3L, 7L, 4L))    // oscillating
    for ((ys, i) <- cases.zipWithIndex) {
      val series = s"s$i"
      val got = run(ys.zipWithIndex.map { case (y, d) =>
        (series, d + 1, y.toInt) })(series)
      val (n, s, v, z) = ref(ys)
      assert(got._1 == n && got._2 == s && got._3 == v, s"case $i: $got")
      (got._4, z) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-7, s"case $i")
        case (a, b) => assert(a == b, s"case $i")
      }
    }
  }

  test("uptrend z is large positive; series are independent") {
    val out = run(
      (1 to 10).map(d => ("up", d, d * 3)) ++
        (1 to 10).map(d => ("flat", d, 5)))
    assert(out("up")._4.get > 3.0)
    assert(out("flat")._4.isEmpty) // all-tied variance collapses
  }
}
