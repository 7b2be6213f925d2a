package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Sequence analytics over event streams — the session-behavior layer a
  * training-data pipeline runs on its interaction logs: which event
  * chains are common (curriculum/funnel design), where a user-behavior
  * Markov chain concentrates mass in steady state (the "what does this
  * log converge to" question), how predictable the next event is (the
  * baseline any sequence model must beat), and how concentrated each
  * user's behavior is (session entropy, a bot/spam signal).
  *
  * Exactness contract (house rules): sequence and transition counts are
  * exact integers from keyed windows; the stationary distribution is the
  * PageRank fixed-point discipline (integer shares via `div`, dangling
  * mass folded back uniformly) so every superstep replays bit-for-bit in
  * SQL; entropy is an order-pinned ln fold over each user's SORTED
  * (type, count) cells, the x199/NMI contract.
  *
  * Scale shape: everything collapses to per-user or per-type-pair state
  * in the FIRST keyed aggregation; the transition matrix is
  * |types|²-bounded METADATA (event vocabularies are small by contract —
  * guarded), so driver-side fixed-point iteration on it is the Linalg
  * sufficient-statistics shape: one corpus scan, O(|types|²) state,
  * iterations never re-read data. */
object SequenceMining {

  private def ordered(user: Column, ts: Column, id: Column) =
    Window.partitionBy(user).orderBy(unix_micros(ts), id)

  /** Per-user contiguous k-grams of the event-type sequence (k ∈ [2, 4])
    * with exact support counts — the frequent-sequence report (the
    * contiguous-pattern core of PrefixSpan, Pei et al. 2001, which is the
    * regime worth mining at 100 TB: gapped patterns explode
    * combinatorially, contiguous ones stay corpus-bounded). Output per
    * sequence: (step_1..step_k, n_users, n_occurrences), support ≥
    * `minUsers` distinct users, ordered by (n_users DESC, steps).
    *
    * Scale shape: one keyed window builds the k-gram stream in place (no
    * self-joins), one aggregation collapses it to the sequence vocabulary
    * (≤ |types|^k cells after the support cut — the exchange carries
    * map-side-combined partials, never raw events). */
  def frequentSequences(
      events: DataFrame,
      user: Column,
      eventType: Column,
      ts: Column,
      id: Column,
      k: Int = 3,
      minUsers: Long = 2L): DataFrame = {
    require(k >= 2 && k <= 4, "frequentSequences: k in [2, 4]")
    require(minUsers >= 1L, "frequentSequences: minUsers >= 1")
    val w = ordered(user, ts, id)
    val steps = (1 until k).map(i =>
      lead(eventType, i).over(w).as(s"step_${i + 1}"))
    val grams = events
      .select((Seq(user.as("__u"), eventType.as("step_1")) ++ steps): _*)
      .where((2 to k).map(i => col(s"step_$i").isNotNull).reduce(_ && _))
    grams
      .groupBy((1 to k).map(i => col(s"step_$i")): _*)
      .agg(countDistinct(col("__u")).as("n_users"),
        count(lit(1)).as("n_occurrences"))
      .where(col("n_users") >= minUsers)
      .orderBy((desc("n_users") +: (1 to k).map(i => col(s"step_$i"))): _*)
  }

  /** Stationary distribution of the per-user event-type Markov chain —
    * fixed-point power iteration on the transition counts with the
    * pageRankFixedPoint integer discipline: π starts uniform in units of
    * 1/scale, each step sends share = π(i) div out(i) along every
    * observed transition weighted by its count, and types with no
    * outgoing transitions redistribute their mass uniformly (the dangling
    * fold). Returns (event_type, n_out, pi_fp) — pi_fp in units of
    * 1/scale, ordered by type.
    *
    * Scale shape: ONE keyed-window scan collapses the corpus to the
    * |types|² transition matrix; that matrix is METADATA (guarded ≤
    * `maxTypes` types) collected once, and all `iters` supersteps run on
    * the driver's tiny matrix — the Linalg sufficient-statistics shape.
    * Exact longs end to end, so any engine replays the recurrence
    * bit-for-bit. */
  def markovStationary(
      events: DataFrame,
      user: Column,
      eventType: Column,
      ts: Column,
      id: Column,
      iters: Int = 12,
      scale: Long = 1000000000000L,
      maxTypes: Int = 64): DataFrame = {
    require(iters >= 1 && iters <= 64, "markovStationary: iters in [1, 64]")
    require(scale >= 1000000L, "markovStationary: scale too small")
    val spark = events.sparkSession
    val w = ordered(user, ts, id)
    val trans = events
      .select(eventType.as("from"), lead(eventType, 1).over(w).as("to"))
      .where(col("to").isNotNull)
      .groupBy("from", "to").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val types = trans.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    require(types.nonEmpty, "markovStationary: no transitions")
    require(types.length <= maxTypes,
      s"markovStationary: ${types.length} event types exceed maxTypes=$maxTypes " +
        "(the matrix must stay metadata-sized)")
    val idx = types.zipWithIndex.toMap
    val n = types.length
    val cnt = Array.ofDim[Long](n, n)
    trans.foreach { case (f, t, c) => cnt(idx(f))(idx(t)) = c }
    val out = Array.tabulate(n)(i => cnt(i).sum)

    var pi = Array.fill(n)(scale / n)
    var t = 0
    while (t < iters) {
      val next = new Array[Long](n)
      var dang = 0L
      var i = 0
      while (i < n) {
        if (out(i) > 0L) {
          val unit = pi(i) / out(i) // integer share per outgoing observation
          var j = 0
          while (j < n) { next(j) += unit * cnt(i)(j); j += 1 }
        } else dang += pi(i)
        i += 1
      }
      val du = dang / n
      var j = 0
      while (j < n) { next(j) += du; j += 1 }
      pi = next
      t += 1
    }

    val rows = types.zipWithIndex.map { case (ty, i) =>
      Row(ty, out(i), pi(i))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      StructType(Seq(
        StructField("event_type", StringType, nullable = false),
        StructField("n_out", LongType, nullable = false),
        StructField("pi_fp", LongType, nullable = false))))
      .orderBy("event_type")
  }

  /** Majority-successor next-event baseline — the skill floor any
    * sequence model must beat before it earns cluster time: predict each
    * type's most frequent observed successor (ties to the
    * lexicographically smallest) and score that rule over ALL observed
    * transitions. Output per type: (from_type, predicted_next, n_from,
    * n_correct, acc_ppm) with exact integer counts and floor-div ppm.
    *
    * Scale shape: the corpus collapses to the |types|² matrix in one
    * keyed-window aggregation; the argmax and accuracy are integer
    * algebra on that bounded frame. */
  def nextEventBaseline(
      events: DataFrame,
      user: Column,
      eventType: Column,
      ts: Column,
      id: Column): DataFrame = {
    val w = ordered(user, ts, id)
    val trans = events
      .select(eventType.as("from_type"), lead(eventType, 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("cnt"))
    // exact integer argmax with smallest-type tie: min over (−cnt, to_type)
    val best = trans
      .groupBy("from_type")
      .agg(min(struct((-col("cnt")).as("nc"), col("to_type"))).as("b"),
        sum("cnt").as("n_from"))
      .select(col("from_type"), col("b.to_type").as("predicted_next"),
        col("n_from"), (-col("b.nc")).as("n_correct"))
    best
      .select(col("from_type"), col("predicted_next"), col("n_from"),
        col("n_correct"),
        expr("(n_correct * 1000000) div n_from").as("acc_ppm"))
      .orderBy("from_type")
  }

  /** Per-user event-type entropy — the behavior-concentration signal
    * (near-zero entropy = single-action bots; high = diffuse browsing).
    * H(user) = Σ −(c/n)·ln(c/n) over the user's type counts, folded in
    * SORTED type order (the x199/NMI order-pinned ln contract) and
    * rounded to 6 dp. Output per user: (user_id, n_events, n_types,
    * entropy), ordered by user.
    *
    * Scale shape: one keyed aggregation to (user, type) cells, one to the
    * per-user sorted cell array (≤ |types| elements each — bounded state
    * per user), the fold is per-row arithmetic. */
  def sessionEntropy(
      events: DataFrame,
      user: Column,
      eventType: Column): DataFrame =
    events
      .select(user.as("user_id"), eventType.as("ty"))
      .groupBy("user_id", "ty").agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ty"), col("c")))).as("o"),
        sum("c").as("n_events"),
        count(lit(1)).as("n_types"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        round(expr(
          """aggregate(o, CAST(0.0 AS DOUBLE),
            |  (acc, x) -> acc - (CAST(x.c AS DOUBLE) / CAST(n_events AS DOUBLE))
            |    * ln(CAST(x.c AS DOUBLE) / CAST(n_events AS DOUBLE)))"""
            .stripMargin), 6).as("entropy"))
      .orderBy("user_id")
}
