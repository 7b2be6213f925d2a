package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals with EXACT arithmetic — the
  * distribution-free coverage guarantee (Vovk et al.; Lei et al. 2018)
  * over a corpus statistic, engine-replayable end to end:
  *
  *   fold 0 (train):  fit the predictor — the per-group mean, exact ppm
  *   fold 1 (calib):  nonconformity = |v·10⁶ − pred_ppm|; the interval
  *                    half-width q is the ⌈(n_cal+1)(1−α)⌉-th smallest
  *                    calibration residual — found by the RadixSelect
  *                    histogram descent, NOT a sort
  *   fold 2 (test):   report per-group coverage of pred ± q, exact ppm —
  *                    the guarantee says ≥ 1−α in expectation
  *
  * Everything is integer: means floor to ppm, the conformal rank is the
  * textbook finite-sample formula, coverage is a count ratio. Scale
  * shape: group stats are one map-side-combined exchange broadcast back;
  * the residual quantile is ≤ 8 aggregation-only scans; the coverage
  * pass is one more keyed aggregation. The corpus is never sorted. */
object Conformal {

  /** One row per group seen in BOTH train and test folds:
    * (grp, n_train, pred_ppm, n_test, n_covered, coverage_ppm) plus the
    * global (n_cal, q_rank, q_ppm) columns. Groups absent from the train
    * fold have no predictor and drop (documented inner join). */
  def splitConformalReport(
      df: DataFrame,
      group: Column,
      value: Column,
      fold: Column,
      alphaPpm: Long = 100000L): DataFrame = {
    require(alphaPpm > 0 && alphaPpm < 1000000L, "alpha is interior ppm")
    val keepPpm = 1000000L - alphaPpm
    val base = df.select(group.as("grp"), value.cast("long").as("v"),
      fold.cast("long").as("fold"))
      .where(col("v").isNotNull && col("fold").isin(0L, 1L, 2L))
    val stats = base.where(col("fold") === 0L)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_train"),
        expr("(cast(sum(v) as decimal(38,0)) * 1000000) div count(1)")
          .cast("long").as("pred_ppm"))
    val calib = base.where(col("fold") === 1L)
      .join(broadcast(stats), Seq("grp"))
      .select(abs(col("v") * 1000000L - col("pred_ppm")).as("r"))
    val sel = RadixSelect.selectAtRanks(calib, col("r"), { n =>
      Seq(0L -> math.min(n, ((n + 1) * keepPpm + 999999L) / 1000000L))
    }).collect()(0)
    val (qRank, qPpm, nCal) = (sel.getLong(1), sel.getLong(2), sel.getLong(3))
    base.where(col("fold") === 2L)
      .join(broadcast(stats), Seq("grp"))
      .groupBy("grp")
      .agg(
        max(col("n_train")).as("n_train"),
        max(col("pred_ppm")).as("pred_ppm"),
        count(lit(1)).as("n_test"),
        sum(when(abs(col("v") * 1000000L - col("pred_ppm")) <= qPpm, 1L)
          .otherwise(0L)).as("n_covered"))
      .select(col("grp"), col("n_train"), col("pred_ppm"),
        col("n_test"), col("n_covered"),
        expr("(n_covered * 1000000) div n_test").as("coverage_ppm"),
        lit(nCal).as("n_cal"), lit(qRank).as("q_rank"),
        lit(qPpm).as("q_ppm"))
  }
}
