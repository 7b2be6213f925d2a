package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson bootstrap — the single-scan, derandomized way to put a
  * confidence interval on a corpus statistic at any scale. Classic
  * bootstrap resamples the corpus B times (B full shuffles); the Poisson
  * approximation gives every row an independent Poisson(1) multiplicity
  * per replicate, so ALL B resamples ride ONE scan as B weighted partial
  * sums — the standard large-scale formulation precisely because it
  * never materializes a resample.
  *
  * Derandomization: replicate b's weight for a row is the Poisson(1)
  * inverse-CDF evaluated at u = top-63-bits(fnv1a+fmix64("id:b")) — the
  * x140 draw chain — against PRECOMPUTED integer thresholds
  * floor(P(≤k)·2⁶³) (literals below, truncated at k = 8, tail mass
  * ~1.1e-7). Every weight therefore replays bit-for-bit in any engine;
  * retries and partitionings cannot change the draw.
  *
  * Scale shape: explode(B) feeds straight into a hash aggregate keyed by
  * replicate — map-side combine leaves B partial rows per task, so the
  * exchange carries B×tasks rows regardless of corpus size. The B·n
  * hash evaluations are the bootstrap's inherent compute (every row
  * contributes to every replicate); B is the dial. The CI quantiles run
  * on the B-row replicate frame (bounded window). */
object Bootstrap {

  /** floor(P(X ≤ k)·2⁶³) for X ~ Poisson(1), k = 0..8 — fixed literals so
    * both engines compare against identical integers. */
  private[operators] val PoissonCdf63: Seq[Long] = Seq(
    3393088950634442752L, 6786177901268885504L, 8482722376586106880L,
    9048237201691847680L, 9189615907968282624L, 9217891649223569408L,
    9222604272766116864L, 9223277504700766208L, 9223361658692597760L)

  /** Piecewise weight from a 63-bit uniform draw: the smallest k with
    * u < T_k, else 9 (the truncation cap). */
  private def weightFromDraw(u: Column): Column =
    PoissonCdf63.zipWithIndex.foldRight(lit(9L)) { case ((t, k), other) =>
      when(u < t, lit(k.toLong)).otherwise(other)
    }

  /** Bootstrap CI for the mean of `value`: one row
    * (n, obs_mean_ppm, b, lo_rank, hi_rank, boot_lo_ppm, boot_hi_ppm).
    * Means are exact integer ppm (Σ w·v · 10⁶ div Σ w); the CI takes the
    * loPpm/hiPpm order statistics of the B replicate means (rank =
    * max(1, ceil(q·B)), quantile-disc semantics). */
  def poissonBootstrapMean(
      df: DataFrame,
      idCol: Column,
      value: Column,
      replicates: Int = 200,
      loPpm: Long = 25000L,
      hiPpm: Long = 975000L): DataFrame = {
    require(replicates >= 4, "need at least 4 replicates for a CI")
    require(loPpm < hiPpm && loPpm > 0 && hiPpm < 1000000L,
      "CI bounds are interior ppm with lo < hi")
    val rows = df.select(idCol.cast("string").as("id"),
      value.cast("long").as("v"))
      .where(col("v").isNotNull)
    val draws = rows
      .withColumn("b", explode(sequence(lit(0L), lit(replicates - 1L))))
      .withColumn("u",
        shiftrightunsigned(
          element_at(call_function("graft_token_hashes_fnv",
            concat_ws(":", col("id"), col("b"))), 1), 1))
      .withColumn("w", weightFromDraw(col("u")))
    val perReplicate = draws.groupBy("b")
      .agg(sum("w").as("sw"), sum(expr("w * v")).as("swv"))
      .where(col("sw") > 0)
      // decimal(38) guards Σw·v·10⁶ against long overflow at large n·vmax
      .select(col("b"),
        expr("(cast(swv as decimal(38,0)) * 1000000) div sw")
          .cast("long").as("mean_ppm"))
    val loRank = math.max(1L, (loPpm * replicates + 999999L) / 1000000L)
    val hiRank = math.max(1L, (hiPpm * replicates + 999999L) / 1000000L)
    val wOrd = Window.orderBy(col("mean_ppm"), col("b"))
    val ci = perReplicate
      .withColumn("rk", row_number().over(wOrd).cast("long"))
      .agg(
        count(lit(1)).as("b"),
        max(when(col("rk") === loRank, col("mean_ppm"))).as("boot_lo_ppm"),
        max(when(col("rk") === hiRank, col("mean_ppm"))).as("boot_hi_ppm"))
    val observed = rows.agg(
      count(lit(1)).as("n"),
      expr("(cast(sum(v) as decimal(38,0)) * 1000000) div count(1)")
        .cast("long").as("obs_mean_ppm"))
    observed.crossJoin(broadcast(ci))
      .select(col("n"), col("obs_mean_ppm"), col("b"),
        lit(loRank).as("lo_rank"), lit(hiRank).as("hi_rank"),
        col("boot_lo_ppm"), col("boot_hi_ppm"))
  }
}
