package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unsupervised outlier scoring over integer document features — the
  * curation filter that surfaces the weirdest rows of a corpus before
  * they poison training: HBOS (histogram-based outlier score, Goldstein
  * & Dengel 2012 — assume feature independence, score = Σ per-feature
  * negative log density) and ECOD (empirical-CDF outlier detection,
  * Li et al. 2022 — per-feature two-sided tail probability, no bins, no
  * knobs).
  *
  * Exactness contract: features are INTEGERS by contract (lengths,
  * counts); HBOS bins are integer floor-div cells against a collected
  * min/max (metadata), densities are exact counts; ECOD tail
  * probabilities are exact ppm rationals from distinct-value prefix
  * counts. The only fp is the final ln sum, evaluated in FIXED feature
  * order as plan literals (correctly-rounded ln on identical inputs —
  * the x199/NMI cross-engine contract) and rounded to 4 dp.
  *
  * Scale shape (both): per-feature state is a BOUNDED side table (nBins
  * histogram cells / the distinct-value frame of an integer feature)
  * built in one aggregation and broadcast back onto a single corpus
  * scan — the corpus itself is never shuffled; the top-k epilogue is a
  * distributed TakeOrdered. */
object Outliers {

  /** HBOS top-k: per feature f, equal-width histogram with
    * bin = ((x − min_f)·nBins) div (max_f − min_f + 1) (exact longs, all
    * rows land in [0, nBins−1]), density = exact bin count, and
    *   score = Σ_f [ln(maxcnt_f) − ln(cnt_f(bin_f(x)))]   (≥ 0)
    * — rows in thin bins across many features float to the top. Output:
    * (id, f1.., score) top-k by (score DESC, id). */
  def hbosTopK(
      df: DataFrame,
      id: Column,
      features: Seq[(String, Column)],
      nBins: Int = 16,
      topK: Int = 50): DataFrame = {
    require(features.nonEmpty && features.size <= 8,
      "hbosTopK: 1..8 integer features")
    require(nBins >= 2 && nBins <= 1024, "hbosTopK: nBins in [2, 1024]")
    require(topK >= 1 && topK <= 100000, "hbosTopK: topK in [1, 1e5]")
    val names = features.map(_._1)
    val base = df.select(
      (id.as("id") +: features.map { case (n, c) => c.cast("long").as(n) }): _*)
      .where(names.map(col(_).isNotNull).reduce(_ && _))
    // min/max per feature: ONE aggregation, collected as metadata
    val mmCols = names.flatMap(n =>
      Seq(min(col(n)).as(s"mn_$n"), max(col(n)).as(s"mx_$n")))
    val mmRow = base.agg(mmCols.head, mmCols.tail: _*).head()
    val mm = names.zipWithIndex.map { case (n, i) =>
      n -> (mmRow.getLong(2 * i), mmRow.getLong(2 * i + 1))
    }.toMap
    def binOf(n: String): Column = {
      val (mn, mx) = mm(n)
      expr(s"(($n - ${mn}L) * ${nBins}L) div (${mx}L - ${mn}L + 1L)")
    }
    val binned = base.select(
      (Seq(col("id")) ++ names.map(col) ++
        names.map(n => binOf(n).as(s"__b_$n"))): _*)
    // per-feature bin counts + the modal count: bounded (nBins) frames,
    // broadcast back — the corpus is never shuffled
    var cur = binned
    names.foreach { n =>
      val cells = binned.groupBy(col(s"__b_$n")).agg(count(lit(1)).as(s"__c_$n"))
      val withMax = cells.crossJoin(
        broadcast(cells.agg(max(s"__c_$n").as(s"__m_$n"))))
      cur = cur.join(broadcast(withMax), Seq(s"__b_$n"))
    }
    val score = names.map(n =>
      log(col(s"__m_$n").cast("double")) - log(col(s"__c_$n").cast("double")))
      .reduce(_ + _) // fixed feature order: a plan-literal ln sum
    cur
      .withColumn("score", round(score, 4))
      .select((col("id") +: names.map(col) :+ col("score")): _*)
      .orderBy(desc("score"), col("id"))
      .limit(topK)
  }

  /** ECOD top-k: per feature, the two-sided empirical tail
    *   tail_ppm = min(F_≤(x), F_≥(x)) · 10⁶   (exact floor-div ppm from
    * distinct-value prefix counts), and
    *   score = Σ_f [ln(10⁶) − ln(tail_ppm_f)]
    * — knob-free: no bins, no thresholds. Output: (id, f1.., score)
    * top-k by (score DESC, id).
    *
    * The prefix counts run on each feature's DISTINCT-VALUE frame (a
    * bounded aggregate for integer features — the x191 window class),
    * never on corpus rows. */
  def ecodTopK(
      df: DataFrame,
      id: Column,
      features: Seq[(String, Column)],
      topK: Int = 50): DataFrame = {
    require(features.nonEmpty && features.size <= 8,
      "ecodTopK: 1..8 integer features")
    require(topK >= 1 && topK <= 100000, "ecodTopK: topK in [1, 1e5]")
    val names = features.map(_._1)
    val base = df.select(
      (id.as("id") +: features.map { case (n, c) => c.cast("long").as(n) }): _*)
      .where(names.map(col(_).isNotNull).reduce(_ && _))
    var cur = base
    names.foreach { n =>
      val cells = base.groupBy(col(n)).agg(count(lit(1)).as("__c"))
      val w = Window.orderBy(col(n))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cdf = cells
        .withColumn("__le", sum("__c").over(w))
        .withColumn("__n", sum("__c").over(wAll))
        .select(col(n),
          expr("(__le * 1000000) div __n").as(s"__le_$n"),
          expr("((__n - __le + __c) * 1000000) div __n").as(s"__ge_$n"))
      cur = cur.join(broadcast(cdf), Seq(n))
    }
    val score = names.map { n =>
      val tail = least(col(s"__le_$n"), col(s"__ge_$n"))
      log(lit(1000000.0d)) - log(tail.cast("double"))
    }.reduce(_ + _)
    cur
      .withColumn("score", round(score, 4))
      .select((col("id") +: names.map(col) :+ col("score")): _*)
      .orderBy(desc("score"), col("id"))
      .limit(topK)
  }
}
