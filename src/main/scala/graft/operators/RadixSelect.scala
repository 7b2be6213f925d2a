package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact k-th order statistics WITHOUT sorting the data: MSB-radix
  * descent. Each round partitions the value domain by its next byte and
  * runs one map-side-combined histogram aggregate (≤ 256 × |active
  * prefixes| groups — the only thing that crosses the wire); the driver
  * walks the histogram to pick each rank's byte and narrows its prefix.
  * ceil(bits/8) rounds resolve every requested rank exactly.
  *
  * This is THE 100 TB way to find an exact global cutoff (quality-score
  * thresholds, price percentiles): a sort is O(n log n) with a full-data
  * range exchange; a single-partition window is a straggler; a groupBy
  * value is O(distinct) — the descent is rounds × O(n) scans whose
  * shuffled payload is a few-KB histogram, independent of n and of the
  * number of distinct values. approx_percentile trades exactness for one
  * pass; this keeps exactness at ≤ 8 passes.
  *
  * Values must be non-negative longs (map doubles monotonically first if
  * needed). Rank semantics: rank r = the r-th smallest (1-based,
  * duplicates counted), i.e. row_number() OVER (ORDER BY v) = r; the
  * requested quantile q_ppm resolves to rank max(1, ceil(q_ppm · n /
  * 10⁶)) — quantile-disc semantics, exact in integers.
  */
object RadixSelect {

  /** One row per requested quantile: (q_ppm, rank, value, n). */
  def quantiles(df: DataFrame, value: org.apache.spark.sql.Column,
      quantilesPpm: Seq[Long]): DataFrame = {
    require(quantilesPpm.nonEmpty, "need at least one quantile")
    require(quantilesPpm.forall(q => q >= 0 && q <= 1000000),
      "quantiles are ppm in [0, 1000000]")
    selectAtRanks(df, value,
      n => quantilesPpm.map(q => q -> math.max(1L, (q * n + 999999L) / 1000000L)))
  }

  /** Exact values at caller-computed 1-based ascending ranks (the rank
    * rule sees n first — conformal quantiles, trimmed bounds, etc.).
    * Same descent, same output shape; the `q_ppm` column carries the
    * caller's key for each requested rank. */
  def selectAtRanks(df: DataFrame, value: org.apache.spark.sql.Column,
      ranksOf: Long => Seq[(Long, Long)]): DataFrame = {
    val spark = df.sparkSession
    val vals = df.select(value.cast(LongType).as("v"))
      .where(col("v").isNotNull)
      .persist()
    try {
      val head = vals.agg(
        count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
        .collect()(0)
      val n = head.getLong(0)
      require(n > 0, "radix select over an empty input")
      require(head.getLong(1) >= 0L,
        "radix select needs non-negative values (map doubles monotonically first)")
      val vmax = head.getLong(2)
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(vmax, 1L))
      val rounds = (bits + 7) / 8

      // rank per key (ranks may collide — dedup the descent state by rank)
      val ranks: Seq[(Long, Long)] = ranksOf(n)
      require(ranks.nonEmpty && ranks.forall { case (_, r) => r >= 1 && r <= n },
        s"requested ranks must lie in [1, $n]")
      // descent state: rank -> (prefix so far, rows before prefix)
      var state: Map[Long, (Long, Long)] =
        ranks.map(_._2).distinct.map(r => r -> (0L, 0L)).toMap

      for (round <- (rounds - 1) to 0 by -1) {
        val shift = round * 8
        val prefixes = state.values.map(_._1).toSeq.distinct
        val scoped =
          if (round == rounds - 1) vals
          else vals.where(shiftrightunsigned(col("v"), shift + 8)
            .isin(prefixes: _*))
        // bucket = the full upper prefix INCLUDING this round's byte, so a
        // single histogram serves every active prefix at once
        val hist = scoped
          .groupBy(shiftrightunsigned(col("v"), shift).as("bucket"))
          .agg(count(lit(1)).as("cnt"))
          .collect()
          .map(r => r.getLong(0) -> r.getLong(1))
          .sortBy(_._1)
        state = state.map { case (rank, (prefix, before)) =>
          var acc = before
          var chosen = -1L
          var chosenBefore = 0L
          val it = hist.iterator.filter(_._1 >> 8 == prefix)
          while (chosen < 0 && it.hasNext) {
            val (bucket, cnt) = it.next()
            if (acc + cnt >= rank) { chosen = bucket; chosenBefore = acc }
            else acc += cnt
          }
          require(chosen >= 0, s"rank $rank fell outside the histogram")
          rank -> (chosen, chosenBefore)
        }
      }

      val rows = ranks.map { case (q, r) =>
        Row(q, r, state(r)._1, n)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("q_ppm", LongType, nullable = false),
          StructField("rank", LongType, nullable = false),
          StructField("value", LongType, nullable = false),
          StructField("n", LongType, nullable = false))))
        .orderBy("q_ppm")
    } finally vals.unpersist(blocking = false)
  }

  /** Winsorized-mean report: exact loPpm/hiPpm cut values via the radix
    * descent, then ONE pass clipping every value into [lo_cut, hi_cut] —
    * the outlier-robust location estimate plus how much the tails moved:
    * (n, lo_cut, hi_cut, n_clipped_lo, n_clipped_hi, mean_ppm_raw,
    * mean_ppm_winsorized), all exact integers. The descent replaces the
    * sort a naive percentile-clip needs; the clip pass is a pure
    * projection + one aggregate. */
  def winsorizedMeanReport(
      df: DataFrame,
      value: org.apache.spark.sql.Column,
      loPpm: Long = 10000L,
      hiPpm: Long = 990000L): DataFrame = {
    require(loPpm < hiPpm, "winsorize needs loPpm < hiPpm")
    val cuts = quantiles(df, value, Seq(loPpm, hiPpm))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val (loCut, hiCut) = (cuts(loPpm), cuts(hiPpm))
    df.select(value.cast(LongType).as("v"))
      .where(col("v").isNotNull)
      .select(col("v"),
        least(greatest(col("v"), lit(loCut)), lit(hiCut)).as("w"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("v") < loCut, 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when(col("v") > hiCut, 1L).otherwise(0L)).as("n_clipped_hi"),
        // decimal(38) guards Σv·10⁶ against long overflow at large n·vmax
        expr("(cast(sum(v) as decimal(38,0)) * 1000000) div count(1)")
          .cast("long").as("mean_ppm_raw"),
        expr("(cast(sum(w) as decimal(38,0)) * 1000000) div count(1)")
          .cast("long").as("mean_ppm_winsorized"))
      .select(col("n"), lit(loCut).as("lo_cut"), lit(hiCut).as("hi_cut"),
        col("n_clipped_lo"), col("n_clipped_hi"),
        col("mean_ppm_raw"), col("mean_ppm_winsorized"))
  }
}
