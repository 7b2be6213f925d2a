package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** cochranArmitage / cliffsDelta / gainsReport contracts: hand-computed
  * references, degenerate-input NULLs, exact truncated-division ppm, and
  * partitioning independence. */
class OrdinalStatsSpec extends SparkSpec {
  import spark.implicits._

  test("cochran–armitage: strong monotone trend matches the textbook formula") {
    // buckets 0,1,2 each n=10 with positives 1,5,9
    val rows = Seq.fill(10)((0L, false)).updated(0, (0L, true)) ++
      (Seq.fill(5)((1L, true)) ++ Seq.fill(5)((1L, false))) ++
      Seq.fill(10)((2L, true)).updated(0, (2L, false))
    val df = rows.toDF("v", "y")
    val r = Evaluation.cochranArmitage(df, col("v"), col("y")).collect().head
    assert(r.getLong(0) == 30L && r.getLong(1) == 15L)
    // t_num = N·Σwr − R·Σwn = 30·(5+18) − 15·(10+20) = 690 − 450 = 240
    assert(r.getLong(2) == 240L)
    val varNum = 15.0 * 15.0 * (30.0 * (10 + 40) - 30.0 * 30.0)
    val z = math.rint(240.0 / math.sqrt(varNum / 30.0) * 1e4) / 1e4
    assert(r.getDouble(3) == z)
  }

  test("cochran–armitage: constant label or single bucket → NULL z") {
    val const = Seq((0L, true), (1L, true), (2L, true)).toDF("v", "y")
    assert(Evaluation.cochranArmitage(const, col("v"), col("y"))
      .collect().head.isNullAt(3))
    val oneBucket = Seq((5L, true), (5L, false), (5L, true)).toDF("v", "y")
    assert(Evaluation.cochranArmitage(oneBucket, col("v"), col("y"))
      .collect().head.isNullAt(3))
  }

  test("cliff's delta: hand-computed pair counts and truncated ppm") {
    // A = {1,2,3}, B = {2,3,4}: gt=1, lt=6 of 9 pairs → δ = −5/9
    val df = (Seq(1L, 2L, 3L).map((_, true)) ++
      Seq(2L, 3L, 4L).map((_, false))).toDF("v", "a")
    val r = Evaluation.cliffsDelta(df, col("v"), col("a")).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 6L)
    assert(r.getLong(4) == -5000000L / 9L) // div truncates toward zero
  }

  test("cliff's delta: identical cohorts → 0; empty cohort → NULL") {
    val same = (Seq(1L, 2L).map((_, true)) ++ Seq(1L, 2L).map((_, false)))
      .toDF("v", "a")
    assert(Evaluation.cliffsDelta(same, col("v"), col("a"))
      .collect().head.getLong(4) == 0L)
    val empty = Seq((1L, true), (2L, true)).toDF("v", "a")
    assert(Evaluation.cliffsDelta(empty, col("v"), col("a"))
      .collect().head.isNullAt(4))
  }

  test("gains report: exact cumulative recall and lift by threshold") {
    val df = (Seq.fill(2)((2L, true)) ++ Seq((1L, true), (1L, false)) ++
      Seq.fill(2)((0L, false))).toDF("v", "y")
    val rows = Evaluation.gainsReport(df, col("v"), col("y")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 1L, 0L))
    val at2 = rows(0); val at1 = rows(1); val at0 = rows(2)
    assert(at2.getLong(3) == 2L && at2.getLong(4) == 2L)
    assert(at2.getLong(5) == 666666L && at2.getLong(6) == 2000000L)
    assert(at1.getLong(5) == 1000000L && at1.getLong(6) == 1500000L)
    assert(at0.getLong(6) == 1000000L)
  }

  test("gains report: no positives → NULL recall/lift, counts intact") {
    val df = Seq((1L, false), (2L, false)).toDF("v", "y")
    val rows = Evaluation.gainsReport(df, col("v"), col("y")).collect()
    assert(rows.forall(r => r.isNullAt(5) && r.isNullAt(6)))
    assert(rows.map(_.getLong(3)).toSeq == Seq(1L, 2L))
  }

  test("all three are partitioning-independent") {
    val df = (1 to 300).map(i => ((i % 9).toLong, i % 4 == 0)).toDF("v", "y")
    def all(d: org.apache.spark.sql.DataFrame): Seq[String] =
      (Evaluation.cochranArmitage(d, col("v"), col("y")).collect() ++
        Evaluation.cliffsDelta(d, col("v"), col("y")).collect() ++
        Evaluation.gainsReport(d, col("v"), col("y")).collect())
        .map(_.toString).toSeq
    assert(all(df) == all(df.repartition(13)))
  }
}
