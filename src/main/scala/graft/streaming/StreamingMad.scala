package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming robust-stats (median / MAD / Hampel outliers) — d38's
  * streaming twin, and the reason the fixed-grid histogram kernel
  * (graft_hist) exists: d38's exact `percentile` buffers every value per
  * group (unbounded state, three passes), which Structured Streaming
  * cannot run. The grid histogram is nBins + 2 longs per group — a
  * legal Complete-mode stateful aggregation — and every downstream
  * quantile walk is a stateless projection over that array, so the
  * whole report streams with ONE stateful operator and no window
  * functions (which streaming would reject after an aggregation).
  *
  * Parity contract (StreamingMadSpec): the Complete-mode table equals
  * batch gridMadReport over the processed prefix after EVERY
  * micro-batch, for any arrival order — the histogram is a pointwise
  * sum, independent of order and partitioning, so parity is exact (not
  * an error envelope). Versus batch d38 itself the report is the
  * documented grid-resolution approximation. */
object StreamingMad {

  /** Running per-group median/MAD/outlier report over a stream. Run with
    * OutputMode.Complete (group-count sized result). */
  def runningMadReport(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      lo: Double,
      hi: Double,
      nBins: Int = 256): DataFrame =
    graft.operators.Sketches.gridMadReport(df, valueCol, groupCol, lo, hi, nBins)
}
