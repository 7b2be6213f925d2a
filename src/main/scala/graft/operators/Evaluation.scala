package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier evaluation over a scored corpus — the harness a quality
  * filter needs before its threshold is trusted on 100 TB: sweep a score
  * column against a boolean label and report the confusion counts +
  * precision/recall/F1 at every threshold.
  *
  * Scale shape: ONE aggregation pass computes every threshold's
  * (tp, fp, fn, tn) as conditional sums — thresholds are plan literals,
  * so the corpus is scanned once, never exploded |thresholds|×, and the
  * reduce state is 4·|thresholds| longs. The per-threshold unpivot then
  * runs on a single 1-row frame (driver-sized). Deterministic end to end
  * — x105's oracle recomputes the same counts and ratio algebra in SQL. */
object Evaluation {

  /** (threshold, tp, fp, fn, tn, precision, recall, f1) per threshold.
    * A null score matches neither `>= t` nor `< t` and lands in no count
    * (mirrors SQL three-valued logic). Precision/recall/F1 define 0/0 as
    * 0.0; ratios are computed unrounded and rounded at the output. */
  def prCurve(
      df: DataFrame,
      score: Column,
      label: Column,
      thresholds: Seq[Double],
      roundTo: Int = 4): DataFrame = {
    require(thresholds.nonEmpty, "prCurve needs at least one threshold")
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(score >= t && label, 1L).otherwise(0L)).as(s"__tp_$i"),
        sum(when(score >= t && !label, 1L).otherwise(0L)).as(s"__fp_$i"),
        sum(when(score < t && label, 1L).otherwise(0L)).as(s"__fn_$i"),
        sum(when(score < t && !label, 1L).otherwise(0L)).as(s"__tn_$i"))
    }
    val counts = df.agg(aggs.head, aggs.tail: _*)
    val perT = thresholds.zipWithIndex.map { case (t, i) =>
      struct(
        lit(t).as("threshold"),
        col(s"__tp_$i").as("tp"), col(s"__fp_$i").as("fp"),
        col(s"__fn_$i").as("fn"), col(s"__tn_$i").as("tn"))
    }
    val long = counts
      .select(explode(array(perT: _*)).as("r"))
      .select(col("r.threshold").as("threshold"),
        col("r.tp").as("tp"), col("r.fp").as("fp"),
        col("r.fn").as("fn"), col("r.tn").as("tn"))
    val p = when(col("tp") + col("fp") === 0L, lit(0.0))
      .otherwise(col("tp") / (col("tp") + col("fp")))
    val r = when(col("tp") + col("fn") === 0L, lit(0.0))
      .otherwise(col("tp") / (col("tp") + col("fn")))
    val f1 = when(p + r === 0.0, lit(0.0)).otherwise(lit(2.0) * p * r / (p + r))
    long.select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
      round(p, roundTo).as("precision"),
      round(r, roundTo).as("recall"),
      round(f1, roundTo).as("f1"))
  }
}
