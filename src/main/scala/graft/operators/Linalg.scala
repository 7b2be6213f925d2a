package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftGramAgg

/** Distributed linear algebra for embedding columns — PCA and ridge-probe
  * training via SUFFICIENT STATISTICS: one bounded-state scan aggregates
  * the Gram/moment matrix (graft_gram_agg, O(dim²) doubles of reduce
  * state), the model is then fit on the driver with a deterministic
  * fixed-iteration solver, and the fitted coefficients broadcast back into
  * a pure projection scan. That is THE 100 TB shape for linear models:
  * corpus rows are touched exactly twice (once to aggregate X'X / X'y,
  * once to score), nothing row-sized ever reaches the driver, and no
  * iteration re-reads the data — the iterations run on a dim×dim matrix.
  *
  * Determinism contract (what makes these oracle-checkable): the gram
  * sums themselves are order-independent — graft_gram_agg quantizes each
  * per-row contribution to the fixed 2⁻²⁰ grid and accumulates integers
  * (see GraftGramAgg), so the buffer is bit-identical under any
  * partitioning and the oracle replays the identical grid in SQL. Every
  * normalized moment (sum/n) is additionally rounded to 6 decimals — the
  * same quantization contract as x56's centroids — and all driver
  * iterations then run on identical binary64 inputs with ordered folds
  * (i-ascending dot products, the exact evaluation order DuckDB's
  * list_dot_product uses). Every add/mul/div/sqrt afterwards is a
  * correctly-rounded IEEE op on identical inputs, so components,
  * eigenvalues and weights replay bit-for-bit in SQL.
  *
  * PCA: power iteration (fixed iters from v₀ = 1/√dim · 1) on the rounded
  * covariance, then Hotelling deflation for the second component — the
  * textbook pair (Golub & Van Loan §8). Ridge: gradient descent on the
  * normalized normal equations (Â = X'X/n rounded, b̂ = X'y/n rounded),
  * step size η = 1/(tr(Â) + λ) ≥-safe since tr bounds the top eigenvalue.
  */
object Linalg {

  /** Spark Round semantics for doubles (HALF_UP on the decimal value) —
    * driver-side moments must round exactly the way the engines do. */
  private[operators] def roundAt(x: Double, scale: Int): Double =
    JBigDecimal.valueOf(x).setScale(scale, RoundingMode.HALF_UP).doubleValue()

  private def round6(x: Double): Double = roundAt(x, 6)

  /** i-ascending fold dot product — the list_dot_product evaluation order. */
  private[operators] def dotAsc(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def matvec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
    Array.tabulate(m.length)(i => dotAsc(m(i), v))

  private def traceAsc(m: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < m.length) { s += m(i)(i); i += 1 }
    s
  }

  /** One-pass sufficient statistics: the raw graft_gram_agg buffer (see
    * GraftGramAgg for the layout). Single scan, constant reduce state. */
  private def gramSums(df: DataFrame, vecCol: String, y: Column, dim: Int): Array[Double] = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val row = df.agg(
      call_function("graft_gram_agg", col(vecCol), y.cast("double"), lit(dim)).as("g")).head()
    row.getSeq[Double](0).toArray
  }

  /** Power iteration: `iters` rounds of v ← Mv/‖Mv‖ from v₀ = 1/√d · 1,
    * then the Rayleigh quotient. Requires a non-degenerate matrix (a zero
    * iterate means every input vector was identical — fail loudly rather
    * than emit NaN columns). */
  private def powerIteration(m: Array[Array[Double]], iters: Int): (Array[Double], Double) = {
    val d = m.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var t = 0
    while (t < iters) {
      val w = matvec(m, v)
      val nrm = math.sqrt(dotAsc(w, w))
      require(nrm > 0.0, "powerIteration: degenerate (zero) covariance iterate")
      v = w.map(_ / nrm)
      t += 1
    }
    val w = matvec(m, v)
    (v, dotAsc(v, w))
  }

  /** Top-2 principal components of a float-vector column, as projection
    * scores per row: (…carry, pc1, pc2, evr1, evr2) where evr is the
    * explained-variance ratio λ/tr(C). `iters` power-iteration rounds per
    * component (12 is plenty at the spectra embeddings have; the count is
    * part of the algorithm's definition, not a convergence knob — both
    * engines run exactly `iters`). */
  def pcaProject(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      carry: Seq[String],
      iters: Int = 12): DataFrame = {
    require(iters >= 1 && iters <= 64, "pcaProject: iters in [1, 64]")
    val g = gramSums(df, vecCol, lit(0.0), dim)
    val n = g(0)
    require(n > 0, "pcaProject: empty input")
    val mu = Array.tabulate(dim)(i => round6(g(1 + i) / n))
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = round6(g(GraftGramAgg.triIndex(dim, i, j)) / n) - mu(i) * mu(j)
        c(i)(j) = v
        c(j)(i) = v
        j += 1
      }
      i += 1
    }
    val tr = traceAsc(c)
    val (v1, lam1) = powerIteration(c, iters)
    val c2 = Array.tabulate(dim, dim)((i, j) => c(i)(j) - lam1 * v1(i) * v1(j))
    val (v2, lam2) = powerIteration(c2, iters)

    df.select(
      carry.map(col) ++ Seq(
        round(call_function("graft_dot_fd", col(vecCol), typedlit(v1.toSeq)), 4).as("pc1"),
        round(call_function("graft_dot_fd", col(vecCol), typedlit(v2.toSeq)), 4).as("pc2"),
        lit(roundAt(lam1 / tr, 4)).as("evr1"),
        lit(roundAt(lam2 / tr, 4)).as("evr2")): _*)
  }

  /** k-ascending matrix product — every cell accumulates Σ_k X(i,k)·Y(k,j)
    * in ascending k, the `list(x.v * y.v ORDER BY x.j)` fold order the
    * oracle replays. */
  private def matmulAsc(
      x: Array[Array[Double]],
      y: Array[Array[Double]]): Array[Array[Double]] = {
    val n = x.length
    Array.tabulate(n, n) { (i, j) =>
      var s = 0.0
      var k = 0
      while (k < n) { s += x(i)(k) * y(k)(j); k += 1 }
      s
    }
  }

  /** ZCA whitening projection via the coupled Newton–Schulz iteration for
    * the matrix inverse square root (Higham, "Functions of Matrices"
    * 2008, §6.3; Schulz 1933): with A = C_ridge/tr(C_ridge) (eigenvalues
    * in (0, 1], so the iteration contracts),
    *   Y₀ = A, Z₀ = I;   T = (3I − Z·Y)/2;   Y ← Y·T;   Z ← T·Z
    * gives Z → A^{−1/2} after a FIXED `iters` rounds, hence
    * W = Z/√tr = C_ridge^{−1/2} — the whitening matrix that equalizes
    * per-direction variance while staying closest to the identity (the
    * "decorrelate the embedding space before cosine retrieval / linear
    * probing" transform; ZCA = the rotation-free whitening). C_ridge =
    * C + ε·I keeps the smallest eigenvalue off zero.
    *
    * Same 100 TB shape as [[pcaProject]]: ONE gram scan, all iterations
    * on the driver's dim×dim matrix (every matmul k-ascending, so the
    * whole trajectory replays as ordered-fold SQL on dense cell frames),
    * then a pure projection scan. Output per row: (…carry, z1, z2,
    * wres) — the first two whitened coordinates z_k = W_k·x − W_k·μ
    * (computed exactly in that two-dot form) rounded to 4 dp, and the
    * corpus-level whiteness residual ‖W·C_ridge·W − I‖_F (rounded, the
    * "did the fixed iteration count actually whiten this spectrum?"
    * diagnostic) repeated on every row. */
  def zcaWhiten(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      carry: Seq[String],
      eps: Double = 0.01,
      iters: Int = 20): DataFrame = {
    require(iters >= 1 && iters <= 40, "zcaWhiten: iters in [1, 40]")
    require(eps > 0.0, "zcaWhiten: eps must be positive")
    require(dim >= 2, "zcaWhiten: dim >= 2 (z1/z2 need two coordinates)")
    val g = gramSums(df, vecCol, lit(0.0), dim)
    val n = g(0)
    require(n > 0, "zcaWhiten: empty input")
    val mu = Array.tabulate(dim)(i => round6(g(1 + i) / n))
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = round6(g(GraftGramAgg.triIndex(dim, i, j)) / n) - mu(i) * mu(j)
        c(i)(j) = v
        c(j)(i) = v
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < dim) { c(i)(i) = c(i)(i) + eps; i += 1 }
    val s = traceAsc(c)
    require(s > 0.0, "zcaWhiten: non-positive ridged trace")
    val a = Array.tabulate(dim, dim)((i, j) => c(i)(j) / s)
    var y = a
    var z = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var t = 0
    while (t < iters) {
      val zy = matmulAsc(z, y)
      val tm = Array.tabulate(dim, dim)((i, j) =>
        ((if (i == j) 3.0 else 0.0) - zy(i)(j)) * 0.5)
      y = matmulAsc(y, tm)
      z = matmulAsc(tm, z)
      t += 1
    }
    val sq = math.sqrt(s)
    val w = Array.tabulate(dim, dim)((i, j) => z(i)(j) / sq)
    val r = matmulAsc(matmulAsc(w, c), w)
    var res2 = 0.0
    i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        val d = r(i)(j) - (if (i == j) 1.0 else 0.0)
        res2 += d * d
        j += 1
      }
      i += 1
    }
    val wres = roundAt(math.sqrt(res2), 4)
    val b0 = dotAsc(w(0), mu)
    val b1 = dotAsc(w(1), mu)
    df.select(
      carry.map(col) ++ Seq(
        round(call_function("graft_dot_fd", col(vecCol),
          typedlit(w(0).toSeq)) - lit(b0), 4).as("z1"),
        round(call_function("graft_dot_fd", col(vecCol),
          typedlit(w(1).toSeq)) - lit(b1), 4).as("z2"),
        lit(wres).as("wres")): _*)
  }

  /** Linear Centered Kernel Alignment (Kornblith et al. 2019, "Similarity
    * of Neural Network Representations Revisited") between two PAIRED
    * representations of the same rows:
    *   CKA(X, Y) = ‖Cov(X,Y)‖²_F / (‖Cov(X)‖_F · ‖Cov(Y)‖_F)
    * — the standard "how much structure survives" score for comparing an
    * embedding against its compressed / re-trained / projected twin
    * (1 = same geometry up to rotation+scale, 0 = unrelated).
    *
    * Shape: the SAME single-scan sufficient-statistics plan as
    * [[pcaProject]] — the two vectors concatenate into one (dimA+dimB)
    * feature vector whose one gram buffer contains the Sxx/Syy/Sxy
    * blocks; the driver centers 6-dp moments and folds the three
    * Frobenius sums in (i asc, j asc) order, the exact order the oracle's
    * list_reduce replays. Output one row:
    * (n_rows, fro_xx, fro_yy, fro_xy, cka), cka NULL when either
    * marginal covariance is all-zero. */
  def linearCka(
      df: DataFrame,
      aCol: Column,
      bCol: Column,
      dimA: Int,
      dimB: Int): DataFrame = {
    require(dimA >= 1 && dimB >= 1 && dimA + dimB <= 512,
      "linearCka: dimA, dimB >= 1 and dimA + dimB <= 512")
    val dim = dimA + dimB
    val g = gramSums(df.select(concat(aCol, bCol).as("__ab")), "__ab", lit(0.0), dim)
    val n = g(0)
    require(n > 0, "linearCka: empty input")
    val mu = Array.tabulate(dim)(i => round6(g(1 + i) / n))
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = round6(g(GraftGramAgg.triIndex(dim, i, j)) / n) - mu(i) * mu(j)
        c(i)(j) = v
        c(j)(i) = v
        j += 1
      }
      i += 1
    }
    // Frobenius block sums, (i asc, j asc) fold over ALL cells of the
    // block — the list_reduce(list(c*c ORDER BY i, j)) evaluation order
    def frob(i0: Int, i1: Int, j0: Int, j1: Int): Double = {
      var s = 0.0
      var ii = i0
      while (ii < i1) {
        var jj = j0
        while (jj < j1) { s += c(ii)(jj) * c(ii)(jj); jj += 1 }
        ii += 1
      }
      s
    }
    val fxx = frob(0, dimA, 0, dimA)
    val fyy = frob(dimA, dim, dimA, dim)
    val fxy = frob(0, dimA, dimA, dim)
    val cka: Option[Double] =
      if (fxx > 0.0 && fyy > 0.0) Some(roundAt(fxy / math.sqrt(fxx * fyy), 6))
      else None
    val s = df.sparkSession
    import s.implicits._
    Seq((n.toLong, roundAt(fxx, 6), roundAt(fyy, 6), roundAt(fxy, 6), cka))
      .toDF("n_rows", "fro_xx", "fro_yy", "fro_xy", "cka")
  }

  /** Quadratic-kernel Maximum Mean Discrepancy between two corpus slices
    * (Gretton et al. 2012, JMLR "A Kernel Two-Sample Test"): for the
    * polynomial kernel k(x,y) = ⟨x,y⟩², the population MMD² reduces to
    *   MMD² = ‖E_P[xxᵀ] − E_Q[xxᵀ]‖²_F
    * — a CLOSED FORM in the two slices' second-moment matrices, so the
    * entire two-sample test costs one grouped gram scan (no pairwise
    * kernel sums, the 100 TB obstruction to the RBF variant). The
    * embedding-drift complement to x232's transport distance: "has the
    * representation's second-order structure moved between slices?".
    * Moments round to 6 dp on the 2⁻²⁰ grid (the x109 contract); the
    * Frobenius fold runs (i asc, j asc) over the dense matrix. Output
    * one row: (n_a, n_b, mmd2, mmd). */
  def quadMmd(
      df: DataFrame,
      vecCol: String,
      sliceA: Column,
      dim: Int): DataFrame = {
    val a = sliceA.cast("boolean")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val rows = df.where(a.isNotNull)
      .groupBy(a.as("a"))
      .agg(call_function("graft_gram_agg", col(vecCol), lit(0.0), lit(dim))
        .as("g"))
      .collect()
      .map(r => r.getBoolean(0) -> r.getSeq[Double](1).toArray)
      .toMap
    require(rows.contains(true) && rows.contains(false),
      "quadMmd: both slices must be non-empty")
    def moments(g: Array[Double]): (Long, Array[Array[Double]]) = {
      val n = g(0)
      require(n > 0, "quadMmd: empty slice")
      val m = Array.ofDim[Double](dim, dim)
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          val v = round6(g(GraftGramAgg.triIndex(dim, i, j)) / n)
          m(i)(j) = v
          m(j)(i) = v
          j += 1
        }
        i += 1
      }
      (n.toLong, m)
    }
    val (na, ma) = moments(rows(true))
    val (nb, mb) = moments(rows(false))
    var mmd2 = 0.0
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        val d = ma(i)(j) - mb(i)(j)
        mmd2 += d * d
        j += 1
      }
      i += 1
    }
    val s = df.sparkSession
    import s.implicits._
    Seq((na, nb, roundAt(mmd2, 6), roundAt(math.sqrt(mmd2), 6)))
      .toDF("n_a", "n_b", "mmd2", "mmd")
  }

  /** Effective-rank audit of the embedding covariance — the
    * representation-collapse dashboard (Roy & Vetterli 2007's effective
    * rank family; the participation ratio is the eigen-free member):
    *   PR      = tr(C)² / ‖C‖²_F = (Σλ)²/Σλ²   (1 = fully collapsed,
    *             dim = isotropic — NO eigendecomposition needed, since
    *             ‖C‖²_F = Σλ² for symmetric C)
    *   top_evr = λ₁/tr(C) via [[pcaProject]]'s fixed power iteration
    * One gram scan; 6-dp moment contract; folds (i asc, j asc). Output
    * one row: (n_rows, trace, frob2, pr, top_evr). */
  def effectiveRank(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      iters: Int = 12): DataFrame = {
    require(iters >= 1 && iters <= 64, "effectiveRank: iters in [1, 64]")
    val g = gramSums(df, vecCol, lit(0.0), dim)
    val n = g(0)
    require(n > 0, "effectiveRank: empty input")
    val mu = Array.tabulate(dim)(i => round6(g(1 + i) / n))
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = round6(g(GraftGramAgg.triIndex(dim, i, j)) / n) - mu(i) * mu(j)
        c(i)(j) = v
        c(j)(i) = v
        j += 1
      }
      i += 1
    }
    val tr = traceAsc(c)
    var frob2 = 0.0
    i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) { frob2 += c(i)(j) * c(i)(j); j += 1 }
      i += 1
    }
    val pr: Option[Double] =
      if (frob2 > 0.0) Some(roundAt(tr * tr / frob2, 4)) else None
    // an all-constant corpus has a zero covariance — every spectral
    // summary is NULL, and the power iteration (which would fail loudly
    // on a zero iterate) must not run at all
    val evr: Option[Double] =
      if (tr > 0.0 && frob2 > 0.0)
        Some(roundAt(powerIteration(c, iters)._2 / tr, 4))
      else None
    val s = df.sparkSession
    import s.implicits._
    Seq((n.toLong, roundAt(tr, 6), roundAt(frob2, 6), pr, evr))
      .toDF("n_rows", "trace", "frob2", "pr", "top_evr")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Johnson–Lindenstrauss sign random projection (Achlioptas 2003's
    * database-friendly ±1 variant): project `vecCol` (dim d) to `outDim`
    * coordinates p_j = Σ_i x_i · s(j,i) / √outDim with signs
    * derandomized the engine's standard way (the d08/x128 md5 trick):
    * s(j,i) = +1 iff the first hex nibble of md5("seed:j:i") ≤ '7' — a
    * pure function of (seed, j, i), so the SAME matrix materializes on
    * any cluster, any engine with md5 (the oracle rebuilds it in SQL,
    * independently). The JL guarantee (pairwise distances preserved
    * within 1±ε w.h.p. for outDim = O(ln n / ε²)) is what makes this the
    * standard cheap pre-ANN dimensionality reduction; JlSpec measures the
    * empirical distortion envelope on a fixture.
    *
    * Scale shape: the outDim×dim sign matrix is driver-built metadata
    * (KBs) baked into the plan as literals; the projection is ONE
    * codegen'd scan (graft_dot_fd ascending-fold dot per output coord) —
    * no shuffle, no state. Output: (…carry, p00..p{outDim-1}), scores
    * rounded to 4 dp like pcaProject (ln()-free arithmetic, the rounding
    * only guards cross-engine last-ulp drift). */
  def jlProject(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      outDim: Int,
      carry: Seq[String],
      seed: String = "jl"): DataFrame = {
    require(outDim >= 1 && outDim <= 256 && outDim <= dim,
      "jlProject: outDim in [1, min(dim, 256)]")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    val rows = Array.tabulate(outDim, dim) { (j, i) =>
      if (md5hex(s"$seed:$j:$i").charAt(0) <= '7') inv else -inv
    }
    df.select(
      carry.map(col) ++ (0 until outDim).map(j =>
        round(call_function("graft_dot_fd", col(vecCol), typedlit(rows(j).toSeq)), 4)
          .as(f"p$j%02d")): _*)
  }

  /** Ridge-regression linear probe on an embedding column — the standard
    * "is signal X linearly decodable from these embeddings?" check run
    * before spending GPU time on a finetune, and a quality-classifier
    * trainer in its own right (score = ŷ of a {0,1} target). Trains on
    * the normalized normal equations with `iters` fixed gradient steps
    * (w ← w − η[(Âw − b̂) + λw], η = round(1/(tr Â + λ), 6)), then scores
    * every row: (…carry, y, score, pred).
    *
    * The features are [x, 1] (bias absorbed as a constant column); Â and
    * b̂ come from the SAME single-scan gram buffer (the Σxᵢ / Σy slots are
    * the intercept row). */
  /** The deterministic ridge solve shared by ridgeProbe and
    * logoInfluence: normalized normal equations from the 6-dp moments of
    * a raw gram buffer (the GraftGramAgg layout), then `iters` fixed
    * gradient steps. Pure driver-side function of the buffer — identical
    * buffers yield bit-identical weights on any run or engine. */
  private[operators] def ridgeFitFromGram(
      g: Array[Double],
      dim: Int,
      lambda: Double,
      iters: Int): Array[Double] = {
    require(iters >= 1 && iters <= 128, "ridgeFitFromGram: iters in [1, 128]")
    require(lambda >= 0.0, "ridgeFitFromGram: lambda must be >= 0")
    val n = g(0)
    require(n > 0, "ridgeFitFromGram: empty input")
    val d1 = dim + 1
    val a = Array.ofDim[Double](d1, d1)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = round6(g(GraftGramAgg.triIndex(dim, i, j)) / n)
        a(i)(j) = v
        a(j)(i) = v
        j += 1
      }
      val m = round6(g(1 + i) / n)
      a(i)(dim) = m
      a(dim)(i) = m
      i += 1
    }
    a(dim)(dim) = round6(n / n)
    val syBase = 1 + dim + dim * (dim + 1) / 2
    val b = Array.tabulate(d1)(i =>
      if (i < dim) round6(g(syBase + i) / n) else round6(g(g.length - 2) / n))
    val eta = round6(1.0 / (traceAsc(a) + lambda))

    var w = Array.fill(d1)(0.0)
    var t = 0
    while (t < iters) {
      val prev = w
      w = Array.tabulate(d1)(i =>
        prev(i) - eta * ((dotAsc(a(i), prev) - b(i)) + lambda * prev(i)))
      t += 1
    }
    w
  }

  def ridgeProbe(
      df: DataFrame,
      vecCol: String,
      yCol: Column,
      dim: Int,
      carry: Seq[String],
      lambda: Double = 0.1,
      iters: Int = 48): DataFrame = {
    val g = gramSums(df, vecCol, yCol, dim)
    val w = ridgeFitFromGram(g, dim, lambda, iters)

    val score =
      round(call_function("graft_dot_fd", col(vecCol), typedlit(w.take(dim).toSeq)) +
        lit(w(dim)), 4)
    df.select(
      carry.map(col) ++ Seq(
        yCol.cast("double").as("y"),
        score.as("score"),
        when(score >= 0.5, lit(1)).otherwise(lit(0)).as("pred")): _*)
  }

  /** Leave-one-group-out (LOGO) influence — exact data valuation for the
    * ridge probe at sufficient-statistics cost: because the gram buffer
    * is ADDITIVE (integer partial sums), refitting the probe with any
    * group removed is a driver-side subtraction of that group's buffer
    * from the corpus total, so K group-ablated refits cost ZERO extra
    * scans (the leave-one-out trick of classical linear influence,
    * Cook 1977, lifted to groups). Per group:
    *   base_acc_ppm     — full-fit accuracy on the whole corpus (global
    *                      context, repeated on every row)
    *   excl_base_ppm    — full-fit accuracy on the corpus MINUS the group
    *   excl_logo_ppm    — ablated-fit accuracy on the same complement
    *   influence_ppm    — excl_logo − excl_base: positive ⇒ removing the
    *                      group IMPROVES the fit on everything else (the
    *                      group is harmful — mislabeled/off-distribution;
    *                      the first list a curation pass reads). The
    *                      complement is the right eval frame: judging an
    *                      ablation on rows that include the ablated
    *                      group's own (possibly poisoned) labels would
    *                      reward fitting the poison.
    *   heldout_base/logo_ppm — accuracy restricted to the held-out
    *                      group itself (does the REST of the corpus
    *                      transfer to it?)
    *   w_shift          — ‖w_logo − w_full‖₂ (6 dp), the parameter-space
    *                      influence norm
    * All rates are exact integer ppm; the fits inherit GraftGramAgg's
    * bit-identical-under-partitioning contract, so the whole readout is
    * oracle-checkable.
    *
    * Scale shape: scan 1 aggregates per-group gram buffers (|groups| ×
    * O(dim²) longs — metadata; groups capped at `maxGroups`); the K+1
    * fits run on the driver's dim×dim matrices; scan 2 scores every row
    * under all K+1 weight vectors as plan-literal projections and
    * collapses to ONE row of 3K+1 conditional counts. Corpus rows are
    * touched exactly twice, nothing row-sized reaches the driver. */
  def logoInfluence(
      df: DataFrame,
      vecCol: String,
      yCol: Column,
      groupCol: Column,
      dim: Int,
      lambda: Double = 0.1,
      iters: Int = 48,
      maxGroups: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val base = df
      .select(groupCol.cast("string").as("grp"), col(vecCol).as("v"),
        yCol.cast("double").as("y"))
      .where(col("grp").isNotNull && col("v").isNotNull && col("y").isNotNull)
    val perGroup = base.groupBy("grp")
      .agg(call_function("graft_gram_agg", col("v"), col("y"), lit(dim)).as("g"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    require(perGroup.length >= 2,
      "logoInfluence: need at least 2 groups (an ablation must leave data)")
    require(perGroup.length <= maxGroups,
      s"logoInfluence: ${perGroup.length} groups exceed maxGroups=$maxGroups " +
        "(each group adds an O(dim^2) driver buffer and a scoring column)")
    val size = perGroup.head._2.length
    // group buffers are S/2^20 with S integer — their double sums are
    // exact while |ΣS| < 2^53, the same envelope one corpus-wide buffer
    // already lives under, so elementwise add/subtract is EXACT
    val full = new Array[Double](size)
    perGroup.foreach { case (_, g) =>
      var i = 0
      while (i < size) { full(i) += g(i); i += 1 }
    }
    val wFull = ridgeFitFromGram(full, dim, lambda, iters)
    val fits = perGroup.map { case (grp, g) =>
      val abl = Array.tabulate(size)(i => full(i) - g(i))
      (grp, g(0).toLong, ridgeFitFromGram(abl, dim, lambda, iters))
    }
    val nTotal = full(0).toLong

    def okCol(w: Array[Double]): Column = {
      val score = round(
        call_function("graft_dot_fd", col("v"), typedlit(w.take(dim).toSeq)) +
          lit(w(dim)), 4)
      (score >= 0.5d) === (col("y") >= 0.5d)
    }
    val okBase = okCol(wFull)
    val aggCols =
      sum(when(okBase, 1L).otherwise(0L)).as("ok_base") +:
        fits.toSeq.zipWithIndex.flatMap { case ((grp, _, w), k) =>
          val ok = okCol(w)
          Seq(
            sum(when(ok, 1L).otherwise(0L)).as(s"ok_$k"),
            sum(when(col("grp") === grp && ok, 1L).otherwise(0L)).as(s"ho_$k"),
            sum(when(col("grp") === grp && okBase, 1L).otherwise(0L)).as(s"hb_$k"))
        }
    val row = base.agg(aggCols.head, aggCols.tail: _*).head()
    def ppm(cnt: Long, n: Long): Long = cnt * 1000000L / n
    val okBaseTotal = row.getLong(0)
    val baseAcc = ppm(okBaseTotal, nTotal)
    val out = fits.toSeq.zipWithIndex.map { case ((grp, nOut, w), k) =>
      val okLogoTotal = row.getLong(1 + 3 * k)
      val hoLogo = row.getLong(2 + 3 * k)
      val hbBase = row.getLong(3 + 3 * k)
      val nExcl = nTotal - nOut
      val exclBase = ppm(okBaseTotal - hbBase, nExcl)
      val exclLogo = ppm(okLogoTotal - hoLogo, nExcl)
      val diff = Array.tabulate(dim + 1)(i => w(i) - wFull(i))
      (grp, nOut,
        baseAcc,
        exclBase,
        exclLogo,
        exclLogo - exclBase,
        ppm(hbBase, nOut),
        ppm(hoLogo, nOut),
        round6(math.sqrt(dotAsc(diff, diff))))
    }
    val s = df.sparkSession
    import s.implicits._
    out.toDF("source_out", "n_out", "base_acc_ppm", "excl_base_ppm",
      "excl_logo_ppm", "influence_ppm", "heldout_base_ppm",
      "heldout_logo_ppm", "w_shift")
      .orderBy("source_out")
  }
}
