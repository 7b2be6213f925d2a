package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entropic optimal transport between two corpus slices (Cuturi 2013's
  * Sinkhorn distance, computed by Sinkhorn–Knopp matrix scaling, 1967) —
  * the drift number that KNOWS SOME CELLS ARE CLOSER THAN OTHERS: where
  * x186's JSD treats "label 3 mass moved to label 4" and "label 3 mass
  * moved to label 9" identically, the transport cost weights every
  * reallocation by the embedding-space distance between the cells, so a
  * mixture shift between semantically adjacent clusters reads as small
  * and a shift across the space reads as large. The readout is the full
  * transport PLAN (who sends mass where — the actionable part for a
  * mixture-rebalancing pass) plus its total cost.
  *
  * All arithmetic is integer fixed-point — the PageRank determinism
  * contract applied to matrix scaling:
  *   - cell centroids: per-cell quantized component sums (the 2⁻²⁰ grid,
  *     exact longs) → micro-unit means by FLOOR division
  *   - ground cost C_ij = Σ_d (mᵢ−mⱼ)² (exact longs), kernel
  *     K_ij = 10¹² div (10⁶ + min(C_ij div epsDiv, 10⁹)) — a positive
  *     rational surrogate for exp(−C/ε) (any positive kernel admits the
  *     same marginal-scaling fixed point; a rational one replays exactly
  *     in SQL where exp would drift cross-engine)
  *   - scaling: u ← a·10¹² div (Kv), v ← b·10¹² div (Kᵀu), `iters` fixed
  *     rounds in BigInt — order-free, overflow-free, bit-replayable
  * Output one row per (cell_a, cell_b): the ppm marginals, kernel, the
  * plan's ppm mass, the total transport cost (cost-grid units × plan
  * share), and the DEBIASED Sinkhorn divergence (Genevay 2018)
  * sk_div = OT(a,b) − (OT(a,a) + OT(b,b))/2 — the raw entropic cost
  * never reaches 0 even for identical slices (the regularizer diffuses
  * mass), so the self-transport terms are subtracted to make "no drift"
  * read as exactly 0; both summary numbers repeat on every row.
  *
  * Scale shape: ONE corpus scan collapses to the |cells| frame (counts
  * per slice + 64 quantized component sums — metadata, cells capped at
  * `maxCells`); the |cells|² kernel and every scaling iteration run on
  * the driver over that metadata. Corpus rows are touched exactly once;
  * nothing row-sized moves. */
object OptimalTransport {

  private val E6 = BigInt(1000000L)
  private val E12 = BigInt(1000000000000L)

  /** Sinkhorn transport plan between the `inA` and NOT-`inA` slices of
    * `df`, over the categorical `cellCol` with ground cost from the
    * embedding centroids of each cell. */
  def sinkhornPlan(
      df: DataFrame,
      vecCol: String,
      cellCol: Column,
      inA: Column,
      dim: Int,
      iters: Int = 30,
      epsDiv: Long = 5000L,
      maxCells: Int = 64): DataFrame = {
    require(dim >= 1 && dim <= 512, "sinkhornPlan: dim in [1, 512]")
    require(iters >= 1 && iters <= 200, "sinkhornPlan: iters in [1, 200]")
    require(epsDiv >= 1L, "sinkhornPlan: epsDiv must be >= 1")
    val base = df
      .select(cellCol.cast("long").as("cell"), inA.cast("boolean").as("a"),
        col(vecCol).as("v"))
      .where(col("cell").isNotNull && col("a").isNotNull &&
        col("v").isNotNull && size(col("v")) === dim)
    // ONE scan: per cell, the two slice counts + 64 quantized component
    // sums (exact longs while n·2²⁰·|x| < 2⁶³ — ~2.9e12 unit-magnitude
    // rows per cell)
    val qCols = (0 until dim).map(d =>
      sum(floor(element_at(col("v"), d + 1).cast("double") *
        lit(1048576.0d) + lit(0.5d)).cast("long")).as(s"q_$d"))
    val aggCols = Seq(
      sum(when(col("a"), 1L).otherwise(0L)).as("na"),
      sum(when(!col("a"), 1L).otherwise(0L)).as("nb"),
      count(lit(1)).as("n")) ++ qCols
    val cells = base.groupBy("cell")
      .agg(aggCols.head, aggCols.tail: _*)
      .collect()
      .map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          Array.tabulate(dim)(d => r.getLong(4 + d)))
      }
      .sortBy(_._1)
    val nC = cells.length
    require(nC >= 2, "sinkhornPlan: need at least 2 cells")
    require(nC <= maxCells,
      s"sinkhornPlan: $nC cells exceed maxCells=$maxCells (the kernel is " +
        "|cells|^2 driver metadata)")
    val nA = cells.map(_._2).sum
    val nB = cells.map(_._3).sum
    require(nA > 0 && nB > 0, "sinkhornPlan: both slices must be non-empty")

    // micro-unit centroid means by TWO integer divisions (components can
    // be negative — Long./ truncates toward zero, exactly like DuckDB's
    // // on signed operands; dividing by n FIRST keeps every intermediate
    // under 2⁶³ at any per-cell row count)
    val m = cells.map { case (_, _, _, n, q) =>
      Array.tabulate(dim) { d =>
        val m20 = q(d) / n
        m20 * 1000000L / 1048576L
      }
    }
    val aPpm = cells.map(c => c._2 * 1000000L / nA)
    val bPpm = cells.map(c => c._3 * 1000000L / nB)
    // ground cost + positive rational kernel
    val cost = Array.tabulate(nC, nC) { (i, j) =>
      var s = 0L
      var d = 0
      while (d < dim) { val df0 = m(i)(d) - m(j)(d); s += df0 * df0; d += 1 }
      s
    }
    val costScaled = Array.tabulate(nC, nC)((i, j) =>
      math.min(cost(i)(j) / epsDiv, 1000000000L))
    val k = Array.tabulate(nC, nC)((i, j) =>
      BigInt(1000000000000L / (1000000L + costScaled(i)(j))))

    // Sinkhorn–Knopp scaling, `iters` fixed rounds in BigInt; returns the
    // plan, its mass total, and the transport cost in cost-grid units
    def scale(
        aSide: Array[Long],
        bSide: Array[Long]): (Array[Array[BigInt]], BigInt, Long) = {
      var v = Array.fill(nC)(E6)
      var u = Array.fill(nC)(BigInt(0))
      var t = 0
      while (t < iters) {
        u = Array.tabulate(nC) { i =>
          val den = (0 until nC).map(j => k(i)(j) * v(j)).sum.max(BigInt(1))
          BigInt(aSide(i)) * E12 / den
        }
        v = Array.tabulate(nC) { j =>
          val den = (0 until nC).map(i => k(i)(j) * u(i)).sum.max(BigInt(1))
          BigInt(bSide(j)) * E12 / den
        }
        t += 1
      }
      val p = Array.tabulate(nC, nC)((i, j) => u(i) * k(i)(j) * v(j))
      val total = p.flatten.sum.max(BigInt(1))
      val ot = (p.flatten.zip(
        (0 until nC).flatMap(i => (0 until nC).map(j => costScaled(i)(j))))
        .map { case (pm, cs) => pm * BigInt(cs) }.sum / total).toLong
      (p, total, ot)
    }
    val (p, total, otCost) = scale(aPpm, bPpm)
    // debiased Sinkhorn divergence (Genevay 2018): the raw entropic cost
    // never reaches 0 (the regularizer diffuses some mass off-diagonal
    // even for a == b) — subtracting the self-transport terms makes
    // "identical slices" read as ~0 and keeps the near-vs-far ordering
    val otAa = scale(aPpm, aPpm)._3
    val otBb = scale(bPpm, bPpm)._3
    val skDiv = otCost - (otAa + otBb) / 2L

    val s = df.sparkSession
    import s.implicits._
    val rows = for {
      i <- 0 until nC
      j <- 0 until nC
    } yield (cells(i)._1, cells(j)._1, aPpm(i), bPpm(j),
      k(i)(j).toLong, (p(i)(j) * E6 / total).toLong, otCost, skDiv)
    rows.toDF("cell_a", "cell_b", "a_ppm", "b_ppm", "k_ppm", "p_ppm",
      "ot_cost", "sk_div")
      .orderBy("cell_a", "cell_b")
  }
}
