package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("bit interleave places x at even and y at odd positions") {
    // x=5 (101), y=3 (011) → z = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 27
    val r = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.interleaveBits(col("x"), col("y"), 3).as("z"))
      .collect().head.getLong(0)
    assert(r == 27L, r.toString)
  }

  test("zValue quantizes by integer division against the global extremes") {
    // x in 0..999 → qx = x*256 div 1000; rows at the bucket edges
    val df = Seq((0L, 0L), (999L, 0L), (500L, 0L)).toDF("x", "y")
    val z = Layout.zValue(df, "x", "y", bits = 8)
      .select(col("x"), col("zval")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // y is constant → qy=0 → zval = even-spread of qx bits
    def spread(q: Long): Long =
      (0 until 8).map(i => ((q >> i) & 1L) << (2 * i)).reduce(_ | _)
    assert(z(0L) == spread(0L))
    assert(z(999L) == spread(999L * 256 / 1000))
    assert(z(500L) == spread(500L * 256 / 1000))
  }

  test("constant clustering column quantizes to 0 without error") {
    val df = Seq((7L, 1L), (7L, 2L), (7L, 3L)).toDF("x", "y")
    val rows = Layout.zOrderLayoutReport(df, "x", "y", bits = 8,
      partitionBits = 2).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 3L)
  }

  test("z-order layout prunes a selective x predicate; a y-range layout cannot") {
    // uniform 100×100 grid; predicate x ∈ [0, 99] of 0..999 (10% of range)
    val rows = for (i <- 0L until 100L; j <- 0L until 100L)
      yield (i * 10 + 3, j * 10 + 7)
    val df = rows.toDF("x", "y")
    val report = Layout.zOrderLayoutReport(df, "x", "y", bits = 8,
      partitionBits = 6, xLo = 0L, xHi = 99L).collect()
    val total = report.length
    val scanned = report.count(_.getAs[Boolean]("scanned"))
    assert(total > 32, s"expected a mostly-populated 64-file layout, got $total")
    // 64 z-files = 8 x-strips × 8 y-strips; a 10% x predicate touches one
    // strip (plus boundary slack) → ≤ 16 of 64 files
    assert(scanned <= total / 4, s"z-order scanned $scanned of $total")
    // the same stats under a y-range layout (files = y ranges): every file
    // spans all of x, so min-max pruning on x keeps every file
    val yLayout = df
      .withColumn("pk", expr("y div 157"))
      .groupBy("pk")
      .agg(min(col("x")).as("min_x"), max(col("x")).as("max_x"))
      .withColumn("scanned", !(col("max_x") < 0L || col("min_x") > 99L))
      .collect()
    assert(yLayout.forall(_.getAs[Boolean]("scanned")),
      "y-range layout should be unprunable on an x predicate")
  }

  test("deterministic across partition layouts") {
    val rows = (0L until 5000L).map(i => (i * 13 % 2017, i * 7 % 991))
    def run(parts: Int) =
      Layout.zOrderLayoutReport(rows.toDF("x", "y").repartition(parts),
        "x", "y", bits = 8, partitionBits = 4)
        .orderBy("pk").collect().map(_.toString).toSeq
    assert(run(1) == run(11))
  }
}
