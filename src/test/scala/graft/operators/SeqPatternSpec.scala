package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** cochranQ / seasonalStrength / runsTest contracts: hand-computed
  * statistics, degenerate NULLs, exact tie handling. */
class SeqPatternSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDf(rows: Seq[(String, String)]) =
    rows.toDF("s", "t").select(col("s"), to_timestamp(col("t")).as("ts"))

  /** (series, day-of-Feb-2024, count) → one event row per count unit.
    * Feb 5 2024 is a Monday, so day = 5 + (dow−1) pins the weekday. */
  private def dailyEvents(cells: Seq[(String, Int, Int)]) =
    eventsDf(cells.flatMap { case (s, d, c) =>
      (1 to c).map(i => (s, f"2024-02-$d%02d 0${i % 9}:0${i % 6}:00"))
    })

  test("cochran q: hand-computed three-classifier table") {
    // truth all true; correctness patterns (1,1,1),(1,1,0),(1,0,1),(1,0,0)
    val df = Seq(
      (true, true, true, true),
      (true, true, false, true),
      (true, false, true, true),
      (true, false, false, true)).toDF("pa", "pb", "pc", "y")
    val r = Evaluation.cochranQ(df,
      Seq("a" -> col("pa"), "b" -> col("pb"), "c" -> col("pc")),
      col("y")).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 1000000L) // a always correct
    assert(r.getLong(3) == 500000L && r.getLong(4) == 500000L)
    // Q = 2·(3·(16+4+4) − 8²) / (3·8 − 18) = 16/6
    assert(r.getDouble(5) == math.rint(16.0 / 6.0 * 1e4) / 1e4)
  }

  test("cochran q: identical classifiers → NULL (denominator 0 when all " +
    "rows agree on all-or-nothing)") {
    val df = Seq((true, true, true), (false, false, true))
      .toDF("pa", "pb", "y")
    // both classifiers identical → every R_i ∈ {0, k} → k·ΣR = ΣR²
    val r = Evaluation.cochranQ(df,
      Seq("a" -> col("pa"), "b" -> col("pa")), col("y")).collect().head
    assert(r.isNullAt(4))
  }

  test("seasonal strength: a pure weekly profile scores 1, a flat series NULL") {
    // two full weeks, count = dow index → residual variance 0
    val pure = dailyEvents(for {
      week <- Seq(0, 7); dow <- 1 to 7
    } yield ("a", 5 + (dow - 1) + week, dow))
    val r = Seasonal.seasonalStrength(pure, col("s"), col("ts"))
      .collect().head
    assert(r.getLong(1) == 14L)
    assert(r.getDouble(2) == 1.0d)
    val flat = dailyEvents((1 to 7).map(dow => ("a", 5 + dow - 1, 3)))
    assert(Seasonal.seasonalStrength(flat, col("s"), col("ts"))
      .collect().head.isNullAt(2)) // zero total variance
  }

  test("seasonal strength: weekday-independent noise scores 0 when the " +
    "profile explains nothing") {
    // same dow gets different counts across weeks, dow means all equal:
    // dow d week1 = 2, week2 = 4 → every dow mean 3, SSB = 0
    val df = dailyEvents(for {
      (week, c) <- Seq((0, 2), (7, 4)); dow <- 1 to 7
    } yield ("a", 5 + (dow - 1) + week, c))
    val r = Seasonal.seasonalStrength(df, col("s"), col("ts"))
      .collect().head
    assert(r.getDouble(2) == 0.0d)
  }

  test("runs test: hand-computed clumped sequence") {
    // counts 5,5,1,1 → above,above,below,below: runs 2, n1=n2=2
    val df = dailyEvents(Seq(("a", 5, 5), ("a", 6, 5), ("a", 7, 1),
      ("a", 8, 1)))
    val r = Seasonal.runsTest(df, col("s"), col("ts")).collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L && r.getLong(3) == 2L)
    assert(r.getLong(4) == 2L)
    // mu = 3, var = 8·4/(16·3) = 2/3 → z = −1/√(2/3)
    assert(r.getDouble(5) == math.rint(-1.0 / math.sqrt(2.0 / 3.0) * 1e4) / 1e4)
  }

  test("runs test: alternating sequence maximizes runs; mean-equal days drop") {
    val alt = dailyEvents(Seq(("a", 5, 5), ("a", 6, 1), ("a", 7, 5),
      ("a", 8, 1)))
    val r = Seasonal.runsTest(alt, col("s"), col("ts")).collect().head
    assert(r.getLong(4) == 4L && r.getDouble(5) > 0.0d)
    // counts 4,2,3 with mean 3: the 3-day is excluded exactly
    val tie = dailyEvents(Seq(("a", 5, 4), ("a", 6, 2), ("a", 7, 3)))
    val r2 = Seasonal.runsTest(tie, col("s"), col("ts")).collect().head
    assert(r2.getLong(1) == 2L && r2.getLong(4) == 2L)
    assert(r2.isNullAt(5)) // n = 2 → variance term degenerate (v = 0)
  }
}
