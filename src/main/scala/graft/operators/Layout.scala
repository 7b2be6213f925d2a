package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering for min-max pruning — the
  * Z-ORDER (Morton-curve) file layout Delta/Iceberg-class lakehouses use:
  * interleaving the bits of two quantized clustering columns makes rows
  * close in EITHER dimension land in the same file, so per-file min/max
  * statistics prune selective predicates on BOTH columns — the layout
  * decision that turns a 100 TB full scan into a few-file read without any
  * index structure. (Single-column range layout prunes only its own
  * column; Z-order trades a little of that for pruning power on each
  * participating dimension.)
  *
  * Everything is integer arithmetic — linear quantization by integer
  * division against the broadcast min/max, then a static 2·bits-term bit
  * interleave — fully codegen'd and bit-replayable in any engine. */
object Layout {

  /** Morton interleave of the low `bits` bits of qx (even positions) and
    * qy (odd positions) — a static OR-reduction, no loops at runtime. */
  private[graft] def interleaveBits(qx: Column, qy: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(qx, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(qy, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Append quantized coordinates and the z-value for two LONG columns.
    * Quantization is qx = ((x − min) · 2^bits) div (max − min + 1) —
    * exact integer arithmetic against the broadcast 1-row extremes, so
    * bucket boundaries are engine-independent. Output: input columns +
    * `zval` (long). */
  def zValue(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 16, "bits must be in [1,16]")
    val mm = df.agg(
      min(col(xCol)).as("__minx"), max(col(xCol)).as("__maxx"),
      min(col(yCol)).as("__miny"), max(col(yCol)).as("__maxy"))
    val scale = 1L << bits
    df.crossJoin(broadcast(mm))
      .withColumn("__qx",
        expr(s"(($xCol - __minx) * $scale) div (__maxx - __minx + 1)"))
      .withColumn("__qy",
        expr(s"(($yCol - __miny) * $scale) div (__maxy - __miny + 1)"))
      .withColumn("zval", interleaveBits(col("__qx"), col("__qy"), bits))
      .drop("__minx", "__maxx", "__miny", "__maxy", "__qx", "__qy")
  }

  /** Z-order layout report: assign each row to file `pk` = the top
    * `partitionBits` bits of its z-value (2^partitionBits files), and
    * emit the per-file footer statistics a lakehouse would write — row
    * count and min/max of both clustering columns. `scanned` flags the
    * files a reader must touch for the predicate xLo ≤ x ≤ xHi under
    * min-max pruning: the pruning-effectiveness audit (count the
    * scanned=true rows vs 2^partitionBits).
    *
    * Scale shape: one broadcast of the 1-row extremes, one per-row
    * projection, one groupBy over ≤ 2^partitionBits keys — the write side
    * pairs this with repartitionByRange(zval) so file boundaries align
    * with z-ranges (ZOrderSpec pins that layout beats a single-column
    * range layout on cross-column predicates). */
  def zOrderLayoutReport(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 8,
      partitionBits: Int = 6,
      xLo: Long = Long.MinValue,
      xHi: Long = Long.MaxValue): DataFrame = {
    require(partitionBits >= 1 && partitionBits <= 2 * bits,
      "partitionBits must be in [1, 2*bits]")
    zValue(df, xCol, yCol, bits)
      .withColumn("pk", shiftright(col("zval"), 2 * bits - partitionBits))
      .groupBy("pk")
      .agg(
        count(lit(1)).as("n"),
        min(col(xCol)).as("min_x"), max(col(xCol)).as("max_x"),
        min(col(yCol)).as("min_y"), max(col(yCol)).as("max_y"))
      .withColumn("scanned",
        !(col("max_x") < xLo || col("min_x") > xHi))
  }
}
