package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label quality assurance — the curation layer that audits the LABELS a
  * training pipeline is about to trust: confident-learning joint counts
  * (which given labels disagree with what the model confidently believes
  * — Northcutt, Jiang & Chuang 2021's label-error estimator) and a
  * weak-supervision label model (agreement-weighted vote over noisy
  * labeling functions, the Snorkel-style merge of Ratner et al. 2017,
  * with exact integer weights instead of EM).
  *
  * Exactness contract: scores ride the engine's standard 1e-4 integer
  * quantization (the brierBinStats s4 grid); class thresholds are
  * floor-div means of those integers; every vote, margin and weight is
  * exact integer algebra — no fp anywhere, so the oracle replays each
  * decision bit-for-bit.
  *
  * Scale shape: confident learning is TWO aggregation passes (threshold
  * sums, then joint cells) with the thresholds crossing as a broadcast
  * 1-row frame; the label model is one weight aggregation broadcast back
  * onto a single corpus scan. Nothing row-sized reaches the driver. */
object LabelQa {

  /** Confident-learning joint (binary): quantize the score to s4 ∈
    * [0, 10⁴] units, set per-class self-confidence thresholds
    *   t_pos = mean s4 over given-positive rows (floor div),
    *   t_neg = mean (10⁴ − s4) over given-negative rows,
    * and count each row into cell (given, pred) when it qualifies
    * confidently: margin_pos = s4 − t_pos ≥ 0 and/or margin_neg =
    * (10⁴ − s4) − t_neg ≥ 0; both → the larger margin wins (tie → the
    * positive class, documented); neither → unconfident, excluded from
    * the joint. Off-diagonal cells are the label-error candidates.
    *
    * Output: one row per (given, pred) cell — (given, pred, n,
    * t_pos, t_neg, n_unconfident), ordered by (given, pred). */
  def confidentLearningJoint(
      df: DataFrame,
      score: Column,
      given: Column): DataFrame = {
    val s = df.select(
      round(score * lit(10000.0d), 0).cast("long").as("s4"),
      given.cast("boolean").as("g"))
      .where(col("s4").isNotNull && col("g").isNotNull)
    val thr = s.agg(
      expr("sum(CASE WHEN g THEN s4 ELSE 0L END) div " +
        "greatest(sum(CASE WHEN g THEN 1L ELSE 0L END), 1L)").as("t_pos"),
      expr("sum(CASE WHEN NOT g THEN 10000L - s4 ELSE 0L END) div " +
        "greatest(sum(CASE WHEN NOT g THEN 1L ELSE 0L END), 1L)").as("t_neg"))
    val staged = s.crossJoin(broadcast(thr))
      .withColumn("m_pos", col("s4") - col("t_pos"))
      .withColumn("m_neg", (lit(10000L) - col("s4")) - col("t_neg"))
      .withColumn("pred",
        when(col("m_pos") >= 0L && col("m_neg") >= 0L,
          when(col("m_pos") >= col("m_neg"), lit(1)).otherwise(lit(0)))
          .when(col("m_pos") >= 0L, lit(1))
          .when(col("m_neg") >= 0L, lit(0))
          .otherwise(lit(null).cast("int")))
    val unconf = staged.agg(
      sum(when(col("pred").isNull, 1L).otherwise(0L)).as("n_unconfident"))
    staged
      .where(col("pred").isNotNull)
      .groupBy(when(col("g"), 1).otherwise(0).as("given"), col("pred"))
      .agg(count(lit(1)).as("n"),
        first("t_pos").as("t_pos"), first("t_neg").as("t_neg"))
      .crossJoin(broadcast(unconf))
      .select(col("given"), col("pred"), col("n"),
        col("t_pos"), col("t_neg"), col("n_unconfident"))
      .orderBy("given", "pred")
  }

  /** Agreement-weighted weak-label merge over three boolean labeling
    * functions: majority vote first, then each function earns weight
    * w_l = ppm agreement with the majority (floor div), and the final
    * label is the WEIGHTED vote — final = 1 iff 2·Σ_{l votes 1} w_l ≥
    * Σ_l w_l (ties to positive, documented). `flipped` marks rows where
    * the weighted vote overturns the raw majority — exactly the rows a
    * curation review queue wants.
    *
    * Output per row: (id, v1, v2, v3, majority, final, flipped, w1_ppm,
    * w2_ppm, w3_ppm), ordered by id. */
  def weakLabelModel(
      df: DataFrame,
      id: Column,
      votes: Seq[Column]): DataFrame = {
    require(votes.length == 3, "weakLabelModel: exactly 3 labeling functions")
    val base = df.select(
      (id.as("id") +: votes.zipWithIndex.map { case (v, i) =>
        v.cast("boolean").as(s"v${i + 1}")
      }): _*)
      .where(col("v1").isNotNull && col("v2").isNotNull && col("v3").isNotNull)
      .withColumn("majority",
        (col("v1").cast("int") + col("v2").cast("int") + col("v3").cast("int"))
          >= 2)
    val wCols = Seq(count(lit(1)).as("n")) ++ (1 to 3).map(i =>
      sum(when(col(s"v$i") === col("majority"), 1L).otherwise(0L)).as(s"a$i"))
    val w = base.agg(wCols.head, wCols.tail: _*)
      .select((1 to 3).map(i =>
        expr(s"(a$i * 1000000) div n").as(s"w${i}_ppm")): _*)
    base.crossJoin(broadcast(w))
      .withColumn("__score",
        (1 to 3).map(i =>
          when(col(s"v$i"), col(s"w${i}_ppm")).otherwise(lit(0L)))
          .reduce(_ + _))
      .withColumn("__total",
        (1 to 3).map(i => col(s"w${i}_ppm")).reduce(_ + _))
      .withColumn("final", col("__score") * 2L >= col("__total"))
      .select(col("id"), col("v1"), col("v2"), col("v3"),
        col("majority"), col("final"),
        (col("final") =!= col("majority")).as("flipped"),
        col("w1_ppm"), col("w2_ppm"), col("w3_ppm"))
      .orderBy("id")
  }

  /** Fleiss' kappa (Fleiss 1971) — chance-corrected agreement among m ≥ 2
    * raters on categorical labels, the multi-rater generalization of
    * x120's two-rater Cohen κ and the standard "are these annotators /
    * weak labelers even consistent?" gate before [[weakLabelModel]]
    * merges them. Per item, Σⱼ n_ij² = m + 2·(agreeing pairs), so the
    * whole statistic reduces to exact integer sums:
    *   P̄  = S / D          S = Σᵢ(Σⱼ n_ij² − m),  D = N·m·(m−1)
    *   P̄e = E / F          E = Σⱼ cⱼ²,            F = (N·m)²
    *   κ  = (P̄ − P̄e)/(1 − P̄e) = (S·F − E·D) / (D·(F − E))
    * carried in decimal(38,0) and emitted as truncated ppm (exact for
    * N ≲ 10¹¹ items at m ≤ 16; shard the audit beyond that). Output one
    * row: (n_items, n_raters, p_bar_ppm, p_e_ppm, kappa_ppm), κ NULL
    * when every rating lands in one category (F = E).
    *
    * Scale shape: two keyed aggregations over the rated rows — one at
    * row grain for the pair-agreement sum, one exploded to m·N label
    * rows that collapse map-side into the |categories| frame. */
  def fleissKappa(df: DataFrame, raters: Seq[Column]): DataFrame = {
    val m = raters.size
    require(m >= 2 && m <= 16, "fleissKappa: 2..16 raters")
    val dec = "decimal(38,0)"
    val rs = raters.map(_.cast("string"))
    val rated = df.where(rs.map(_.isNotNull).reduce(_ && _))
      .select(rs.zipWithIndex.map { case (c, i) => c.as(s"r$i") }: _*)
    val pairAgree = (for {
      i <- 0 until m; j <- (i + 1) until m
    } yield when(col(s"r$i") === col(s"r$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    val rowStats = rated.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum(pairAgree * lit(2L)), lit(0L)).as("s"))
    val catCounts = rated
      .select(explode(array((0 until m).map(i => col(s"r$i")): _*)).as("lab"))
      .groupBy("lab").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr(s"CAST(c AS $dec) * c")),
        lit(0L).cast(dec)).as("e"))
    rowStats.crossJoin(broadcast(catCounts))
      .select(
        col("n_items"), lit(m.toLong).as("n_raters"),
        when(col("n_items") > 0L,
          expr(s"(CAST(s AS $dec) * 1000000) div " +
            s"(CAST(n_items AS $dec) * ${m.toLong * (m - 1)})").cast("long"))
          .otherwise(lit(null).cast("long")).as("p_bar_ppm"),
        when(col("n_items") > 0L,
          expr(s"(e * 1000000) div (CAST(n_items AS $dec) * n_items * ${m.toLong * m})")
            .cast("long"))
          .otherwise(lit(null).cast("long")).as("p_e_ppm"),
        when(col("n_items") > 0L &&
          expr(s"CAST(n_items AS $dec) * n_items * ${m.toLong * m} <> e"),
          expr(
            s"""((CAST(s AS $dec) * (CAST(n_items AS $dec) * n_items * ${m.toLong * m})
               |  - e * (CAST(n_items AS $dec) * ${m.toLong * (m - 1)})) * 1000000)
               |div ((CAST(n_items AS $dec) * ${m.toLong * (m - 1)})
               |  * (CAST(n_items AS $dec) * n_items * ${m.toLong * m} - e))"""
              .stripMargin.replace("\n", " ")).cast("long"))
          .otherwise(lit(null).cast("long")).as("kappa_ppm"))
      .orderBy("n_items")
  }
}
