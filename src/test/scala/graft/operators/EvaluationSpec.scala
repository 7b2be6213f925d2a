package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** prCurve contracts: exact confusion counts on a hand-checkable set, the
  * 0/0 → 0 ratio convention, null-score rows landing in no bucket, and
  * the single-scan plan shape (no per-threshold re-aggregation). */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  // scores 0.1..0.8, label = score >= 0.5 (perfectly separable at 0.5)
  private def scored = (1 to 8).map(i => (i / 10.0, i >= 5)).toDF("s", "lab")

  test("exact counts and ratios on a separable set") {
    val out = Evaluation.prCurve(scored, col("s"), col("lab"),
      thresholds = Seq(0.3, 0.5, 0.7))
      .orderBy("threshold").collect()
    // t=0.3: predicts 0.3..0.8 positive → tp=4 fp=2 fn=0 tn=2
    assert(out(0).getLong(1) == 4 && out(0).getLong(2) == 2 &&
      out(0).getLong(3) == 0 && out(0).getLong(4) == 2)
    assert(out(0).getAs[Double]("precision") == 0.6667) // round(4/6, 4)
    // t=0.5: perfect split
    assert(out(1).getAs[Double]("precision") == 1.0 &&
      out(1).getAs[Double]("recall") == 1.0 && out(1).getAs[Double]("f1") == 1.0)
    // t=0.7: tp=2 fn=2 → recall 0.5
    assert(out(2).getAs[Double]("recall") == 0.5)
  }

  test("0/0 ratios define as 0.0; null scores land in no bucket") {
    val df = Seq((Some(0.2), false), (None, true), (None, false))
      .toDF("s", "lab")
    val out = Evaluation.prCurve(df, col("s"), col("lab"),
      thresholds = Seq(0.5)).collect()
    // nothing predicted positive and no positives scored: tp=fp=fn'=0 →
    // precision = 0.0 (not null/NaN); null-score rows count nowhere
    val r = out.head
    assert(r.getLong(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0)
    assert(r.getLong(4) == 1, "only the non-null negative lands in tn")
    assert(r.getAs[Double]("precision") == 0.0 && r.getAs[Double]("f1") == 0.0)
  }
}
