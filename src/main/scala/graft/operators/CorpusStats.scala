package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level composition reports: cross-source overlap and vocabulary
  * growth — the health checks run when new crawl snapshots or sources are
  * merged into a training mix. */
object CorpusStats {

  private def rnd4(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** Pairwise source similarity matrix: Jaccard overlap of each source
    * pair's DISTINCT token-shingle sets — the mirror-detection / provenance
    * report (two crawls of the same site, a dataset re-released under a new
    * name, cross-source template reuse). Output one row per source pair
    * that shares at least one shingle: (source_a, source_b, n_shared,
    * jaccard).
    *
    * Scale shape: shingles travel as 8-byte kernel hashes, never strings;
    * the (source, gram)-distinct projection collapses map-side before its
    * exchange. The pair join's fan-out per gram is bounded by the gram's
    * source frequency squared — at most nSources² — so the operator is
    * sized for metadata-scale source counts (tens to hundreds of corpora),
    * NOT per-document keys; that is the intended granularity of a mixture
    * report. Jaccard is exact rational arithmetic over the hash sets
    * (engine-independent; a kernel hash collision would fold two shingles
    * and is ~2⁻⁶⁴ per pair). */
  def sourceOverlapMatrix(
      docs: DataFrame,
      textCol: String,
      sourceCol: String,
      shingleSize: Int = 3): DataFrame = {
    require(shingleSize >= 1, "shingleSize must be positive")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = docs
      .select(col(sourceCol).as("source"),
        explode(call_function("graft_shingle_hashes", col(textCol), lit(shingleSize)))
          .as("__g"))
      .distinct()
    val sizes = grams.groupBy("source").agg(count(lit(1)).as("__n"))
    val a = grams.select(col("source").as("source_a"), col("__g"))
    val b = grams.select(col("source").as("source_b"), col("__g"))
    a.join(b, Seq("__g"))
      .where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("source").as("source_a"), col("__n").as("__na"))),
        Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"), col("__n").as("__nb"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_shared"),
        rnd4(col("n_shared") / (col("__na") + col("__nb") - col("n_shared")))
          .as("jaccard"))
  }

  /** Corpus snapshot diff — the CDC-style maintenance report between two
    * versions of a corpus (two crawl snapshots, pre/post a cleaning run):
    * per id, `added` / `removed` / `changed` / `unchanged` by normalized
    * content digest. Output: (id, status, digest_old, digest_new) with ''
    * for the absent side.
    *
    * Scale shape: both sides project to (id, 32-byte digest) at the scan —
    * text never leaves its side — then one co-partitioned full-outer join
    * on the id. The digest is TextAnalysis.fingerprintMd5 (whitespace-
    * normalized lowercase md5), so formatting-only churn reads as
    * unchanged. */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      textCol: String,
      idCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).cast("long").as("id"),
      TextAnalysis.fingerprintMd5(col(textCol)).as("__do"))
    val n = newDf.select(col(idCol).cast("long").as("id"),
      TextAnalysis.fingerprintMd5(col(textCol)).as("__dn"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__do").isNull, "added")
          .when(col("__dn").isNull, "removed")
          .when(col("__do") =!= col("__dn"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("__do"), lit("")).as("digest_old"),
        coalesce(col("__dn"), lit("")).as("digest_new"))
  }

  /** Vocabulary growth curve (the Heaps'-law report): walk the corpus in
    * id order split into nBuckets NTILE slices and report, per slice, how
    * many NEVER-SEEN-BEFORE terms it contributes and the cumulative
    * vocabulary size — the classic diminishing-returns check before paying
    * for more data from the same source.
    *
    * Scale shape: "first seen" is min(id) per term — one map-side-combined
    * aggregation over the exploded postings; the slice assignment reuses
    * Curriculum.difficultyBuckets' exact-NTILE two-phase rank (no global
    * window over rows); the final cumulative sum runs over nBuckets rows,
    * a metadata-sized frame. */
  def vocabularyGrowth(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be ≥ 1")
    val buckets = Curriculum.difficultyBuckets(
      docs.select(col(idCol).as("__id")), "__id", "__id", nBuckets)
    val firstSeen = docs
      .select(col(idCol).as("__id"), explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(min(col("__id")).as("__fid"))
    val newTerms = firstSeen
      .join(buckets.select(col("__id").as("__fid"), col("bucket")), Seq("__fid"))
      .groupBy("bucket").agg(count(lit(1)).as("new_terms"))
    val docCounts = buckets.groupBy("bucket").agg(count(lit(1)).as("n_docs"))
    val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docCounts
      .join(newTerms, Seq("bucket"), "left")
      .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
      .withColumn("vocab_size", sum(col("new_terms")).over(w))
      .select("bucket", "n_docs", "new_terms", "vocab_size")
  }

  /** Heaps'-law fit over the vocabulary-growth curve — V(n) = K·n^β by
    * ordinary least squares on (ln cumulative-tokens, ln vocab) across the
    * x66 buckets, plus the extrapolated vocabulary at `extrapolateFactor`×
    * the current token count. That extrapolation is the 100 TB planning
    * number this report exists for: what vocabulary (hash-table sizes,
    * sketch capacities, tokenizer coverage) to expect at target scale from
    * a small-corpus measurement.
    *
    * Determinism: the ≤ nBuckets fit points collapse to ONE ordered array
    * (array_sort over bucket) and every OLS sum is a left fold over that
    * array — aggregation order is pinned, so both engines run the same
    * IEEE sequence and only the ln() ulps differ (absorbed by the rounded
    * outputs, the x33 convention). */
  def heapsLawFit(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      nBuckets: Int = 10,
      extrapolateFactor: Double = 100.0): DataFrame = {
    require(nBuckets >= 2, "a regression needs ≥ 2 buckets")
    val buckets = Curriculum.difficultyBuckets(
      docs.select(col(idCol).as("__id")), "__id", "__id", nBuckets)
    val toks = docs.select(col(idCol).as("__id"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("__n"))
    val bTok = toks.join(buckets, Seq("__id"))
      .groupBy("bucket").agg(sum(col("__n")).as("__bt"))
    val firstSeen = docs
      .select(col(idCol).as("__id"), explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(min(col("__id")).as("__fid"))
    val bNew = firstSeen
      .join(buckets.select(col("__id").as("__fid"), col("bucket")), Seq("__fid"))
      .groupBy("bucket").agg(count(lit(1)).as("__bn"))
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val curve = bTok.join(bNew, Seq("bucket"), "left")
      .withColumn("__bn", coalesce(col("__bn"), lit(0L)))
      .select(col("bucket"),
        sum(col("__bt")).over(w).as("__ct"),
        sum(col("__bn")).over(w).as("__vb"))
      .where(col("__ct") > 0 && col("__vb") > 0)

    val pts = curve.agg(array_sort(collect_list(struct(
      col("bucket"),
      log(col("__ct").cast("double")).as("lx"),
      log(col("__vb").cast("double")).as("ly"),
      col("__ct"), col("__vb")))).as("a"))
    def fold(f: Column => Column): Column =
      aggregate(col("a"), lit(0.0d), (acc, p) => acc + f(p))
    val sums = pts.select(
      size(col("a")).cast("double").as("np"),
      fold(_.getField("lx")).as("sx"),
      fold(_.getField("ly")).as("sy"),
      fold(p => p.getField("lx") * p.getField("ly")).as("sxy"),
      fold(p => p.getField("lx") * p.getField("lx")).as("sxx"),
      fold(p => p.getField("ly") * p.getField("ly")).as("syy"),
      when(size(col("a")) > 0, element_at(col("a"), -1).getField("__ct"))
        .as("tokens_now"),
      when(size(col("a")) > 0, element_at(col("a"), -1).getField("__vb"))
        .as("vocab_now"))
    val beta = (col("np") * col("sxy") - col("sx") * col("sy")) /
      (col("np") * col("sxx") - col("sx") * col("sx"))
    val lnk = (col("sy") - beta * col("sx")) / col("np")
    val r2num = col("np") * col("sxy") - col("sx") * col("sy")
    val r2 = (r2num * r2num) /
      ((col("np") * col("sxx") - col("sx") * col("sx")) *
        (col("np") * col("syy") - col("sy") * col("sy")))
    // ANSI mode: guard the OLS divisions behind the point-count check
    // (CaseWhen evaluates only the taken branch) — a degenerate curve
    // yields nulls, never DIVIDE_BY_ZERO
    val fittable = col("np") >= 2
    sums.select(
      col("np").cast("long").as("n_points"),
      when(fittable, rnd4(beta)).as("beta"),
      when(fittable, rnd4(exp(lnk))).as("k_coeff"),
      when(fittable, rnd4(r2)).as("r2"),
      col("tokens_now"), col("vocab_now"),
      when(fittable, floor(exp(lnk + beta *
        log(lit(extrapolateFactor) * col("tokens_now").cast("double"))) + 0.5)
        .cast("long")).as("predicted_vocab_at_factor"))
  }

  /** Vocabulary richness estimators per group — the "how much vocabulary
    * have we NOT seen yet" dual to the Heaps-law growth fit:
    *   chao1_est        — bias-corrected Chao1 lower bound on the true
    *                      vocabulary: D + f1(f1−1) div (2(f2+1)), where
    *                      f1/f2 = singleton/doubleton term counts
    *   gt_unseen_ppm    — Good–Turing mass of UNSEEN terms: f1·10⁶ div N
    *                      (the next token is new with ≈ this probability)
    * Exact integers throughout (the bias-corrected Chao1 form needs no
    * f2 > 0 guard). Scale shape: explode → (group, term) counts collapse
    * map-side; the estimator aggregates |groups| rows. */
  def richnessReport(
      docs: DataFrame,
      textCol: String,
      groupCol: String): DataFrame = {
    val terms = docs
      .select(col(groupCol).as("grp"),
        explode(filter(split(lower(trim(col(textCol))), "\\s+"),
          t => t =!= "")).as("term"))
      .groupBy("grp", "term")
      .agg(count(lit(1)).as("tf"))
    terms.groupBy("grp")
      .agg(
        sum("tf").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("tf") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("grp"), col("n_tokens"), col("n_distinct"),
        col("f1"), col("f2"),
        expr("n_distinct + (f1 * (f1 - 1)) div (2 * (f2 + 1))").as("chao1_est"),
        expr("(f1 * 1000000) div n_tokens").as("gt_unseen_ppm"))
  }

  /** Source-concentration report: the exact Gini coefficient of
    * per-source corpus mass plus the head share — "is this corpus five
    * domains wearing a trench coat?", the inequality summary that
    * complements x141's per-KEY skew diagnosis (this is per-SOURCE
    * contribution inequality, the thing mixture reweighting (x30/x125)
    * exists to fix).
    *
    * Exactness: with per-source masses x₁ ≤ … ≤ x_n (ties broken by
    * source name — any total order gives the same Gini since the
    * statistic depends only on the multiset through the sorted sum),
    *   gini_ppm = 10⁶ · (2·Σ i·xᵢ − (n+1)·Σxᵢ) div (n·Σxᵢ)
    * — all decimal(38,0) integers, no fp anywhere.
    *
    * Scale shape: ONE keyed aggregation collapses the corpus to the
    * |sources|-row mass frame; the rank window and the sums run on that
    * bounded frame (the x125 discipline — thousands of sources, never
    * corpus rows). One output row. */
  def sourceConcentration(
      df: DataFrame,
      sourceCol: Column,
      weightCol: Column): DataFrame =
    finishConcentration(sourceMasses(df, sourceCol, weightCol))

  /** The per-source mass state — one commutative long per source, which
    * is also exactly the streaming aggregation state (StreamingGini). */
  def sourceMasses(
      df: DataFrame,
      sourceCol: Column,
      weightCol: Column): DataFrame =
    df.groupBy(sourceCol.cast("string").as("grp"))
      .agg(sum(weightCol.cast("long")).as("x"))

  /** The Gini/head-share finish as a stateless view over an
    * ALREADY-MATERIALIZED (grp, x) mass frame — shared by the batch
    * report and the streaming twin's consumer. */
  def finishConcentration(massesIn: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val masses = massesIn
    val w = org.apache.spark.sql.expressions.Window.orderBy("x", "grp")
    masses
      .withColumn("i", row_number().over(w).cast("long"))
      .agg(
        count(lit(1)).as("n_sources"),
        sum(col("x").cast(dec)).as("tot"),
        sum(col("i").cast(dec) * col("x")).as("six"),
        max(col("x")).as("top"))
      .select(
        col("n_sources"),
        col("tot").cast("long").as("total_mass"),
        expr(s"CAST((2 * six - (n_sources + 1) * tot) * 1000000 " +
          s"div (CAST(n_sources AS $dec) * tot) AS BIGINT)").as("gini_ppm"),
        expr("CAST((CAST(top AS decimal(38,0)) * 1000000) div tot AS BIGINT)")
          .as("top_share_ppm"))
  }

  /** Herfindahl–Hirschman concentration + Hill diversity numbers as a
    * SECOND stateless lens over the same per-source mass state x166's
    * Gini and StreamingGini keep: HHI = Σ(xᵢ/T)² as exact integer ppm
    * ((10⁶·Σx²) div T²), the order-2 Hill number (inverse Simpson —
    * "effective sources" robust to the tail) as exact ppm (10⁶·T² div
    * Σx²), and the order-1 Hill number exp(H) via an ORDER-PINNED
    * entropy fold over the group-sorted mass array (list_reduce replay).
    * One row: (n_sources, total_mass, hhi_ppm, ens_simpson_ppm,
    * ens_shannon).
    *
    * Scale shape: everything runs on the |sources|-bounded mass frame;
    * one aggregation, one fold. */
  def finishHhi(massesIn: DataFrame, roundTo: Int = 4): DataFrame = {
    val dec = "decimal(38,0)"
    massesIn
      .agg(
        count(lit(1)).as("n_sources"),
        coalesce(sum(col("x").cast(dec)), lit(0L).cast(dec)).as("tot"),
        coalesce(sum(col("x").cast(dec) * col("x")), lit(0L).cast(dec)).as("sx2"),
        sort_array(collect_list(struct(col("grp"), col("x")))).as("o"))
      .withColumn("hraw", expr(
        """-aggregate(o, CAST(0.0 AS DOUBLE), (acc, s) ->
          |  acc + (CAST(s.x AS DOUBLE) / CAST(tot AS DOUBLE))
          |      * ln(CAST(s.x AS DOUBLE) / CAST(tot AS DOUBLE)))""".stripMargin))
      .select(
        col("n_sources"),
        col("tot").cast("long").as("total_mass"),
        when(col("tot") === lit(0L).cast(dec), lit(null).cast("long"))
          .otherwise(expr(s"(CAST(1000000 AS $dec) * sx2) div (tot * tot)")
            .cast("long")).as("hhi_ppm"),
        when(col("sx2") === lit(0L).cast(dec), lit(null).cast("long"))
          .otherwise(expr(s"(CAST(1000000 AS $dec) * tot * tot) div sx2")
            .cast("long")).as("ens_simpson_ppm"),
        when(col("tot") === lit(0L).cast(dec), lit(null).cast("double"))
          .otherwise(round(exp(col("hraw")), roundTo)).as("ens_shannon"))
  }

  /** Hill tail-index estimator (Hill 1975) over a positive integer value
    * column — "how heavy is the tail of the length/count distribution?",
    * the number that decides whether a per-document cap is load-bearing
    * (α ≤ 2 means the variance of the distribution is carried by a
    * handful of giants) or cosmetic. Over the top-k order statistics
    * x₍₁₎ ≥ … ≥ x₍ₖ₎ > x₍ₖ₊₁₎:
    *   1/α̂ = (1/k) Σ_{i≤k} ln(x₍ᵢ₎ / x₍ₖ₊₁₎)
    * Output one row: (k, x_tail_min = x₍ₖ₊₁₎, inv_alpha, alpha), rounded
    * to 6 dp; alpha is NULL when the whole tail frame is one repeated
    * value (Σ = 0).
    *
    * Determinism: the top-(k+1) VALUE multiset is unique however ties at
    * the cut are broken, and the ln sum folds over the desc-sorted value
    * array — the order-pinned list_reduce replay every other fp fold in
    * this module uses. Scale shape: distributed TakeOrdered of k+1 rows
    * (never a global sort), then a single (k+1)-row aggregation. */
  /** Simple Good–Turing discount table (Good 1953; Gale & Sampson 1995's
    * presentation) — the LM-smoothing view of the frequency spectrum that
    * [[richnessReport]]'s single unseen-mass number summarizes: for each
    * observed count r ≤ maxR, the Turing-adjusted count
    *   r* = (r+1)·N_{r+1}/N_r      (as exact ppm of a count)
    * says what a term SEEN r times is actually worth when the corpus
    * grows — the discount curve a Katz/Kneser-Ney-style smoother
    * consumes, and the sanity check that token frequencies follow the
    * expected spectrum shape (a scraped corpus whose N₁/N₂ ratio is off
    * usually has boilerplate or dedup problems). Output per r:
    * (r, n_r, n_r1, r_star_ppm, mass_ppm) + the corpus-level unseen mass
    * p0_ppm = N₁·10⁶ div N repeated on every row. Exact integers
    * throughout; rows with N_r = 0 carry NULL r_star.
    *
    * Scale shape: explode → term counts collapse map-side; the
    * frequency-of-frequencies frame is ≤ maxR+1 rows. */
  def goodTuringTable(
      docs: DataFrame,
      textCol: String,
      maxR: Int = 10): DataFrame = {
    require(maxR >= 1 && maxR <= 1000, "goodTuringTable: maxR in [1, 1000]")
    val terms = docs
      .select(explode(filter(split(lower(trim(col(textCol))), "\\s+"),
        t => t =!= "")).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("tf"))
    val tot = terms.agg(
      sum("tf").as("n_tokens"),
      sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("f1"))
    val fof = terms
      .where(col("tf") <= maxR + 1)
      .groupBy(col("tf").as("r"))
      .agg(count(lit(1)).as("n_r"))
    val rGrid = docs.sparkSession.range(1, maxR + 1).select(col("id").as("r"))
    rGrid
      .join(fof, Seq("r"), "left")
      .join(fof.select((col("r") - 1L).as("r"), col("n_r").as("n_r1")),
        Seq("r"), "left")
      .crossJoin(broadcast(tot))
      .select(
        col("r"),
        coalesce(col("n_r"), lit(0L)).as("n_r"),
        coalesce(col("n_r1"), lit(0L)).as("n_r1"),
        when(coalesce(col("n_r"), lit(0L)) > 0L, expr(
          "((r + 1) * coalesce(n_r1, CAST(0 AS BIGINT)) * 1000000) div n_r"))
          .otherwise(lit(null).cast("long")).as("r_star_ppm"),
        // empty/all-whitespace corpus → n_tokens is NULL (empty sum) or 0
        // (guarded-empty edge partitions); an unguarded div 0 errors under
        // ANSI where DuckDB's // 0 likewise errors — NULL row instead
        when(coalesce(col("n_tokens"), lit(0L)) > 0L,
          expr("(coalesce(n_r, CAST(0 AS BIGINT)) * r * 1000000) div n_tokens"))
          .otherwise(lit(null).cast("long")).as("mass_ppm"),
        when(coalesce(col("n_tokens"), lit(0L)) > 0L,
          expr("(f1 * 1000000) div n_tokens"))
          .otherwise(lit(null).cast("long")).as("p0_ppm"))
      .orderBy("r")
  }

  /** Capture–recapture estimate of the TRUE distinct-document universe
    * (Chapman 1951's bias-corrected Lincoln–Petersen): treat two corpus
    * slices as two "capture" occasions over distinct content keys and
    * estimate how many distinct documents EXIST (crawled or not yet):
    *   N̂ = (n_a+1)(n_b+1) div (m+1) − 1,   m = |A ∩ B|
    * — the dedup-planning number ("how much new content is left?") that
    * pure observed-distinct counting cannot give. Output one row:
    * (n_a, n_b, m_overlap, n_union, chapman_est, unseen_est). Exact
    * integers; slices with zero overlap give the degenerate (but
    * well-defined) Chapman bound.
    *
    * Scale shape: one keyed aggregation per content key (map-side
    * collapse), then a 1-row count aggregate. */
  def captureRecapture(
      docs: DataFrame,
      key: Column,
      sliceA: Column): DataFrame = {
    val keys = docs
      .where(key.isNotNull && sliceA.isNotNull)
      .select(md5(key).as("k"),
        sliceA.cast("boolean").as("a"))
      .groupBy("k")
      .agg(max(when(col("a"), 1L).otherwise(0L)).as("in_a"),
        max(when(!col("a"), 1L).otherwise(0L)).as("in_b"))
    keys.agg(
      sum("in_a").as("n_a"),
      sum("in_b").as("n_b"),
      sum(col("in_a") * col("in_b")).as("m_overlap"),
      count(lit(1)).as("n_union"))
      .select(
        col("n_a"), col("n_b"), col("m_overlap"), col("n_union"),
        expr("((n_a + 1) * (n_b + 1)) div (m_overlap + 1) - 1")
          .as("chapman_est"),
        expr("((n_a + 1) * (n_b + 1)) div (m_overlap + 1) - 1 - n_union")
          .as("unseen_est"))
  }

  def hillTailIndex(df: DataFrame, valueCol: Column, k: Int = 200): DataFrame = {
    require(k >= 2 && k <= 100000, "hillTailIndex: k in [2, 1e5]")
    df.select(valueCol.cast("long").as("x"))
      .where(col("x") > 0L)
      .orderBy(desc("x"))
      .limit(k + 1)
      .agg(sort_array(collect_list("x"), asc = false).as("arr"))
      .select(
        lit(k.toLong).as("k"),
        // fewer than k+1 positive rows → the estimator is undefined; a
        // bare element_at(arr, k+1) would THROW under ANSI where the
        // DuckDB oracle's arr[k+1] yields NULL — guard so both engines
        // agree on an all-NULL row (the when() short-circuits, the
        // out-of-range element_at is never evaluated)
        when(size(col("arr")) >= k + 1, element_at(col("arr"), k + 1))
          .otherwise(lit(null).cast("long")).as("x_tail_min"),
        when(size(col("arr")) >= k + 1, expr(
          s"""aggregate(slice(arr, 1, $k), CAST(0.0 AS DOUBLE), (acc, v) ->
             |  acc + ln(CAST(v AS DOUBLE)
             |    / CAST(element_at(arr, ${k + 1}) AS DOUBLE)))""".stripMargin))
          .otherwise(lit(null).cast("double")).as("s"))
      .select(
        col("k"),
        col("x_tail_min"),
        round(col("s") / lit(k.toDouble), 6).as("inv_alpha"),
        when(col("s") > 0.0d, round(lit(k.toDouble) / col("s"), 6))
          .otherwise(lit(null).cast("double")).as("alpha"))
  }
}
