package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation (Kaplan & Meier 1958) over event-log
  * lifetimes — the churn/retention curve a product team reads before
  * trusting a cohort cut, with right-censoring done properly (users still
  * active at the observation horizon are censored, not counted as churned
  * — the mistake naive retention queries make).
  *
  * Scale shape: the corpus collapses in ONE keyed aggregation to per-user
  * (first, last) activity days, then to a CALENDAR-BOUNDED life table
  * (duration → events, censored — at most one row per day of the
  * observation span, the x125 bounded-frame discipline). Everything after
  * — at-risk suffix sums, the product-limit estimator — runs as ordered
  * array folds over that one driver-safe row, so the survival product is
  * evaluated in ONE deterministic order (never a fp aggregation whose
  * result depends on partitioning). x170's oracle replays the identical
  * folds via DuckDB list_reduce.
  */
object Survival {

  /** Per-user (duration, churned): duration = days between first and last
    * activity; churned iff the last activity is strictly older than the
    * global horizon (max activity day) minus `churnGapDays` — otherwise
    * the user is right-censored (still alive at the horizon for all we
    * know). The 1-row horizon broadcasts into the per-user frame. */
  def userDurations(
      events: DataFrame,
      user: Column,
      ts: Column,
      churnGapDays: Int = 7): DataFrame =
    spansToDurations(userSpans(events, user, ts), churnGapDays)

  /** Per-entity (first, last) activity days — the ONE stateful
    * aggregation. This is the streaming twin's running state: min/max
    * are commutative, so late events only widen a span. */
  def userSpans(events: DataFrame, user: Column, ts: Column): DataFrame =
    events.select(user.as("u"), to_date(ts).as("d"))
      .groupBy("u")
      .agg(min(col("d")).as("first_d"), max(col("d")).as("last_d"))

  /** Spans → (duration, churned): stateless. The churn horizon is the
    * max last-activity day OF THE SPANS THEMSELVES (1-row broadcast), so
    * the same view closes over batch input and streaming state alike. */
  def spansToDurations(spans: DataFrame, churnGapDays: Int = 7): DataFrame = {
    require(churnGapDays >= 0, "spansToDurations: churnGapDays >= 0")
    val horizon = spans.agg(max("last_d").as("h"))
    spans.crossJoin(broadcast(horizon))
      .select(
        datediff(col("last_d"), col("first_d")).cast("long").as("duration"),
        (col("last_d") < date_sub(col("h"), churnGapDays)).as("churned"))
  }

  /** The full stateless finish from a spans frame — shared by batch and
    * the streaming twin (whose running per-entity min/max state IS the
    * spans frame). */
  def finishFromSpans(
      spans: DataFrame,
      churnGapDays: Int = 7,
      roundTo: Int = 6): DataFrame =
    finishKm(lifeTable(spansToDurations(spans, churnGapDays)), roundTo)

  /** The life table — (duration, events, censored), calendar-bounded.
    * Mergeable by pointwise sum, so a streaming twin can keep exactly
    * this frame as running state. */
  def lifeTable(durations: DataFrame): DataFrame =
    durations.groupBy("duration")
      .agg(
        sum(when(col("churned"), 1L).otherwise(0L)).as("events"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("censored"))

  /** The product-limit finish as a stateless view over an
    * already-materialized life table: per distinct duration d,
    *   at_risk  = users with duration ≥ d (suffix sum),
    *   survival = Π_{d' ≤ d} (1 − events_{d'} / at_risk_{d'}),
    * censored users leave the risk set after their duration (the standard
    * censored-after-events-at-the-same-time convention). The fold runs on
    * the ONE collected calendar-bounded row, in duration order — every
    * fp product is order-pinned. */
  def finishKm(lifeTable: DataFrame, roundTo: Int = 6): DataFrame =
    lifeTable
      .agg(sort_array(collect_list(struct(
        col("duration"), col("events"), col("censored")))).as("o"))
      .withColumn("n", expr(
        "aggregate(o, 0L, (a, x) -> a + x.events + x.censored)"))
      // rs[i] (1-based) = at-risk entering the i-th duration
      .withColumn("rs", expr(
        """aggregate(o, array(n),
          |  (acc, x) -> concat(acc,
          |    array(element_at(acc, -1) - x.events - x.censored)))""".stripMargin))
      // per-duration survival factor, then the order-pinned running product
      .withColumn("fs", expr(
        """zip_with(o, slice(rs, 1, size(o)),
          |  (x, r) -> 1.0D - CAST(x.events AS DOUBLE) / CAST(r AS DOUBLE))"""
          .stripMargin))
      .withColumn("cum", expr(
        """aggregate(fs, array(CAST(1.0 AS DOUBLE)),
          |  (acc, x) -> concat(acc, array(element_at(acc, -1) * x)))"""
          .stripMargin))
      .select(posexplode(col("o")).as(Seq("i", "s")),
        col("rs"), col("cum"))
      .select(
        col("s.duration").as("duration"),
        expr("element_at(rs, i + 1)").as("at_risk"),
        col("s.events").as("events"),
        col("s.censored").as("censored"),
        round(expr("element_at(cum, i + 2)"), roundTo).as("survival"))

  /** Nelson–Aalen cumulative hazard (Nelson 1972 / Aalen 1978) as a
    * SECOND stateless lens over the SAME life-table state [[finishKm]]
    * and StreamingKm keep: per distinct duration d,
    *   H(d)  = Σ_{d'≤d} events/at_risk            (cumulative hazard),
    *   var   = Σ_{d'≤d} events/at_risk²           (Klein–Moeschberger),
    *   S_FH  = exp(−H)                            (Fleming–Harrington),
    * the hazard-scale view a churn model regresses on where KM's
    * product-limit only plots. Same order-pinned array-fold discipline:
    * at-risk suffix sums and all three running sums fold over the ONE
    * collected calendar-bounded row, so every fp term is
    * partition-order-free (list_reduce replay). Output per duration:
    * (duration, at_risk, events, censored, cum_hazard, fh_survival,
    * na_var). */
  def finishNa(lifeTable: DataFrame, roundTo: Int = 6): DataFrame =
    lifeTable
      .agg(sort_array(collect_list(struct(
        col("duration"), col("events"), col("censored")))).as("o"))
      .withColumn("n", expr(
        "aggregate(o, 0L, (a, x) -> a + x.events + x.censored)"))
      .withColumn("rs", expr(
        """aggregate(o, array(n),
          |  (acc, x) -> concat(acc,
          |    array(element_at(acc, -1) - x.events - x.censored)))""".stripMargin))
      .withColumn("hs", expr(
        """zip_with(o, slice(rs, 1, size(o)),
          |  (x, r) -> CAST(x.events AS DOUBLE) / CAST(r AS DOUBLE))"""
          .stripMargin))
      .withColumn("cum", expr(
        """aggregate(hs, array(CAST(0.0 AS DOUBLE)),
          |  (acc, x) -> concat(acc, array(element_at(acc, -1) + x)))"""
          .stripMargin))
      // Klein–Moeschberger variance terms events/at_risk², same fold shape
      .withColumn("hv", expr(
        """zip_with(o, slice(rs, 1, size(o)),
          |  (x, r) -> CAST(x.events AS DOUBLE) /
          |    (CAST(r AS DOUBLE) * CAST(r AS DOUBLE)))""".stripMargin))
      .withColumn("cumv", expr(
        """aggregate(hv, array(CAST(0.0 AS DOUBLE)),
          |  (acc, x) -> concat(acc, array(element_at(acc, -1) + x)))"""
          .stripMargin))
      .select(posexplode(col("o")).as(Seq("i", "s")),
        col("rs"), col("cum"), col("cumv"))
      .select(
        col("s.duration").as("duration"),
        expr("element_at(rs, i + 1)").as("at_risk"),
        col("s.events").as("events"),
        col("s.censored").as("censored"),
        round(expr("element_at(cum, i + 2)"), roundTo).as("cum_hazard"),
        round(exp(-expr("element_at(cum, i + 2)")), roundTo).as("fh_survival"),
        round(expr("element_at(cumv, i + 2)"), roundTo).as("na_var"))

  /** The composed Nelson–Aalen estimator: events → per-user durations →
    * life table → hazard curve. One corpus scan, same life table as
    * [[kaplanMeier]]. */
  def nelsonAalen(
      events: DataFrame,
      user: Column,
      ts: Column,
      churnGapDays: Int = 7,
      roundTo: Int = 6): DataFrame =
    finishNa(lifeTable(userDurations(events, user, ts, churnGapDays)), roundTo)

  /** The composed estimator: events → per-user durations → life table →
    * survival curve. One corpus scan; |output| = distinct durations. */
  def kaplanMeier(
      events: DataFrame,
      user: Column,
      ts: Column,
      churnGapDays: Int = 7,
      roundTo: Int = 6): DataFrame =
    finishKm(lifeTable(userDurations(events, user, ts, churnGapDays)), roundTo)
}
