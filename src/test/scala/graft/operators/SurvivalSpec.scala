package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** kaplanMeier: right-censoring at the horizon, at-risk suffix sums, and
  * the order-pinned product-limit estimator — verified against a direct
  * sequential reference. */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")

  /** (user, firstDay, lastDay) events — two rows per user. */
  private def frame(users: Seq[(String, Int, Int)]) =
    users.flatMap { case (u, f, l) => Seq((u, ts(f)), (u, ts(l))) }
      .toDF("u", "t")

  test("curve matches a hand-computed life table with censoring") {
    // horizon = day 20; gap 7 → churned iff last < day 13
    val df = frame(Seq(
      ("a", 1, 3),   // dur 2, churned
      ("b", 1, 5),   // dur 4, churned
      ("c", 2, 6),   // dur 4, churned
      ("d", 1, 15),  // dur 14, censored (last ≥ 13)
      ("e", 2, 20),  // dur 18, censored
      ("f", 6, 10))) // dur 4, churned
    val rows = Survival.kaplanMeier(df, col("u"), col("t"), churnGapDays = 7)
      .orderBy("duration").collect()
    // life table: dur 2 (1 ev), dur 4 (3 ev), dur 14 (1 cen), dur 18 (1 cen)
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4)))
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSeq == Seq(
      (2L, 6L, 1L, 0L), (4L, 5L, 3L, 0L), (14L, 2L, 0L, 1L), (18L, 1L, 0L, 1L)))
    val s2 = 1.0 - 1.0 / 6.0
    val s4 = s2 * (1.0 - 3.0 / 5.0)
    assert(math.abs(got(0)._5 - s2) < 1e-6)
    assert(math.abs(got(1)._5 - s4) < 1e-6)
    assert(math.abs(got(2)._5 - s4) < 1e-6) // censoring leaves S unchanged
    assert(math.abs(got(3)._5 - s4) < 1e-6)
  }

  test("no churn at all: survival stays 1.0, at-risk still drains") {
    val df = frame(Seq(("a", 15, 20), ("b", 14, 19), ("c", 18, 20)))
    val rows = Survival.kaplanMeier(df, col("u"), col("t"), churnGapDays = 7)
      .orderBy("duration").collect()
    assert(rows.forall(_.getDouble(4) == 1.0))
    assert(rows.map(_.getLong(2)).forall(_ == 0L))
  }

  test("everyone churns on the same duration: one cliff row") {
    val df = frame(Seq(("a", 1, 2), ("b", 3, 4), ("c", 5, 6), ("z", 1, 28)))
    val rows = Survival.kaplanMeier(df, col("u"), col("t"), churnGapDays = 7)
      .orderBy("duration").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getLong(1) == 4L &&
      rows(0).getLong(2) == 3L)
    assert(math.abs(rows(0).getDouble(4) - 0.25) < 1e-9)
  }

  test("empty input yields an empty curve") {
    val df = Seq.empty[(String, Timestamp)].toDF("u", "t")
    assert(Survival.kaplanMeier(df, col("u"), col("t")).collect().isEmpty)
  }

  test("nelson–aalen: hand-computed hazard on the cliff example") {
    val df = frame(Seq(("a", 1, 2), ("b", 3, 4), ("c", 5, 6), ("z", 1, 28)))
    val rows = Survival.nelsonAalen(df, col("u"), col("t"), churnGapDays = 7)
      .orderBy("duration").collect()
    assert(rows.length == 2)
    // duration 1: at_risk 4, events 3 → H = 0.75; duration 27: censored
    assert(rows(0).getLong(1) == 4L && rows(0).getLong(2) == 3L)
    assert(rows(0).getDouble(4) == 0.75d)
    assert(rows(0).getDouble(5) ==
      math.rint(math.exp(-0.75) * 1e6) / 1e6)
    assert(rows(1).getDouble(4) == 0.75d) // censoring adds no hazard
    // Klein–Moeschberger variance: 3/4² = 0.1875, flat once events stop
    assert(rows(0).getDouble(6) == 0.1875d)
    assert(rows(1).getDouble(6) == 0.1875d)
  }

  test("nelson–aalen vs kaplan–meier: exp(−H) ≥ S_KM everywhere, equal " +
    "in the no-churn case") {
    val df = frame(Seq(("a", 1, 5), ("b", 2, 4), ("c", 1, 9), ("d", 3, 3),
      ("z", 1, 28)))
    val na = Survival.nelsonAalen(df, col("u"), col("t"), churnGapDays = 7)
      .orderBy("duration").collect().map(r => (r.getLong(0), r.getDouble(5)))
    val km = Survival.kaplanMeier(df, col("u"), col("t"), churnGapDays = 7)
      .orderBy("duration").collect().map(r => (r.getLong(0), r.getDouble(4)))
    assert(na.map(_._1).toSeq == km.map(_._1).toSeq)
    na.zip(km).foreach { case ((_, fh), (_, s)) =>
      assert(fh >= s - 1e-9, s"FH $fh < KM $s")
    }
    val calm = frame(Seq(("a", 15, 20), ("b", 14, 19)))
    val naC = Survival.nelsonAalen(calm, col("u"), col("t"), churnGapDays = 7)
      .collect()
    assert(naC.forall(_.getDouble(4) == 0.0d))
    assert(naC.forall(_.getDouble(5) == 1.0d))
  }
}
