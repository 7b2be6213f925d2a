package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic per-category corpus sampling — the mixture-weighting step
  * of a pretraining data recipe: downsample dominant sources/languages,
  * keep rare ones, reproducibly.
  *
  * The accept/reject decision is a pure function of the document id: keep a
  * row when the first 8 hex chars of md5(id) — a uniform 32-bit draw, the
  * same replayable trick as the d08 sampling query — fall below the
  * category's rate threshold. No RNG state, no partitioning sensitivity, and
  * the same document keeps/drops identically on any cluster.
  */
object MixtureSampling {

  /** Lowercase-hex acceptance threshold for a rate in [0,1): compare
    * strings, compare numbers — the hex alphabet is ordered. Clamped to
    * 0xffffffff: for rate ≥ 1-2^-33 the product rounds to exactly 2^32,
    * which would format as the 9-char "100000000" and the 8-char-prefix
    * comparison would then keep only '0'-prefixed draws (~6% instead of
    * ~100%). */
  private def thresholdHex(rate: Double): String =
    f"${math.min(math.floor(rate * 4294967296.0).toLong, 0xffffffffL)}%08x"

  /** Keep-predicate for one rate over the given id column. */
  private def keep(idCol: Column, rate: Double): Column =
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else substring(md5(idCol.cast("string")), 1, 8) < lit(thresholdHex(rate))

  /** Filter `df` keeping each category at its configured rate (categories
    * absent from `rates` use `defaultRate`). Rates that are exact binary
    * fractions (0.5, 0.25, …) produce thresholds that replay exactly in any
    * engine with md5 — used by the oracle-checked query. */
  def sampleByRates(
      df: DataFrame,
      categoryCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    val id = col(idCol)
    val predicate = rates.toSeq.sortBy(_._1) match {
      case Seq() => keep(id, defaultRate)
      case (k0, r0) +: rest =>
        rest.foldLeft(when(col(categoryCol) === k0, keep(id, r0))) {
          case (acc, (k, r)) => acc.when(col(categoryCol) === k, keep(id, r))
        }.otherwise(keep(id, defaultRate))
    }
    df.where(predicate)
  }

  /** Stratified EXACT-k sampling: keep precisely min(k, |stratum|) rows per
    * category, chosen by md5(id) order — deterministic, partition-layout
    * independent, and quota-exact where sampleByRates is probabilistic.
    * One shuffle on the category; each stratum ranks inside its own
    * partition. For pathologically hot strata (one category = most of a
    * 100 TB corpus), prefilter with sampleByRates at an oversampled rate
    * before ranking so the window never sees the full stratum — the
    * prefilter keeps the md5-smallest rows, so with adequate oversampling
    * the exact top-k survives. */
  def stratifiedExactK(
      df: DataFrame,
      categoryCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(categoryCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Neyman-allocation stratified sampling (Neyman 1934): split a fixed
    * budget of `totalN` draws across strata ∝ N_h·σ_h — high-variance
    * strata get proportionally more rows than proportional allocation
    * would give, which minimizes the variance of the stratified mean
    * estimator. The sample itself is the usual deterministic md5-ranked
    * draw (stratifiedExactK's discipline), so the same budget reproduces
    * the same rows on any cluster. Output: (stratum, id, rk), rk the
    * within-stratum draw rank.
    *
    * Allocation contract: σ_h is the POPULATION standard deviation of
    * `value` within the stratum (exact decimal sufficient statistics,
    * one sqrt); real-valued quotas round by LARGEST REMAINDER with
    * (fraction DESC, stratum ASC) tie-break; a stratum allocated more
    * than its population is capped at N_h with NO redistribution
    * (documented simplification — budget may under-fill when a tiny
    * stratum dominates the variance); constant strata (σ = 0) draw 0
    * rows unless a leftover lands on them. Every fp sum over the
    * stratum frame runs under an ORDERED full-frame window, so addition
    * order is pinned (sqrt/division are correctly-rounded IEEE — no
    * rounding armor needed, unlike the reservoir's pow).
    *
    * Scale shape: ONE keyed aggregation to the |strata|-bounded stats
    * frame; the allocation windows run there; the draw joins the
    * broadcast allocation onto one corpus scan with a group-limited
    * rank window (≤ alloc rows per stratum survive the exchange). */
  def neymanSample(
      df: DataFrame,
      stratumCol: String,
      value: Column,
      idCol: String,
      totalN: Int,
      seed: String = "v1"): DataFrame = {
    require(totalN >= 1, "neymanSample: totalN >= 1")
    val dec = "decimal(38,0)"
    import org.apache.spark.sql.expressions.Window
    val stats = df
      .select(col(stratumCol).cast("string").as("g"),
        value.cast("long").as("v"))
      .where(col("g").isNotNull && col("v").isNotNull)
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(dec)).as("s"),
        sum(col("v").cast(dec) * col("v")).as("q"))
    val full = Window.orderBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val weighted = stats
      .withColumn("w",
        sqrt((col("q").cast("double") -
          col("s").cast("double") * col("s").cast("double") /
            col("n").cast("double")) / col("n").cast("double")) *
          col("n").cast("double"))
      .withColumn("wsum", sum("w").over(full))
    val quota = weighted
      .withColumn("quota",
        when(col("wsum") <= 0.0d, lit(0.0d))
          .otherwise(lit(totalN.toDouble) * col("w") / col("wsum")))
      .withColumn("base", floor(col("quota")).cast("long"))
      .withColumn("frac", col("quota") - col("base"))
      .withColumn("leftover", lit(totalN.toLong) - sum("base").over(full))
      .withColumn("frk", row_number().over(
        Window.orderBy(desc("frac"), col("g"))).cast("long"))
      .withColumn("alloc",
        when(col("wsum") <= 0.0d, lit(0L))
          .otherwise(least(
            col("base") + when(col("frk") <= col("leftover"), 1L).otherwise(0L),
            col("n"))))
      .select(col("g"), col("alloc"))
    val w = Window.partitionBy("g")
      .orderBy(md5(concat_ws(":", lit(seed), col("id").cast("string"))),
        col("id"))
    // the draw pool is the SAME population the (n, σ) allocation was
    // computed from — a NULL-value row never informed any stratum's cap,
    // so it must not compete for a slot either
    df.select(col(stratumCol).cast("string").as("g"), col(idCol).as("id"))
      .where(col("g").isNotNull && value.cast("long").isNotNull)
      .join(broadcast(quota), Seq("g"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= col("alloc"))
      .select(col("g").as("stratum"), col("id"), col("rk"))
      .orderBy("stratum", "rk")
  }

  /** Weighted reservoir sampling per category (Efraimidis & Spirakis 2006,
    * the A-ES scheme): each row draws a deterministic uniform u from
    * md5(seed:id) (the KMV sketch's 60-bit draw) and keeps priority
    * u^(1/w); the k LARGEST priorities per category are the weight-
    * proportional without-replacement sample. Deterministic and
    * partition-layout independent like stratifiedExactK, but inclusion
    * probability tracks the weight column — the corpus-curation knob for
    * "sample per source, favoring high-quality/long documents".
    *
    * Priorities are ROUNDED (6 decimals) before ranking in BOTH engines
    * so pow()'s last-ulp implementation spread cannot flip a rank
    * boundary; ties fall back to the id. Rows with non-positive or null
    * weight are excluded (they have inclusion probability 0).
    *
    * Scale shape: one keyed exchange; WindowGroupLimit trims each
    * partition to its local top-k before the shuffle, so the exchange
    * moves ≤ k rows per (category × partition) — the same bounded-state
    * economics as the KMV sketch. */
  def weightedReservoirPerCategory(
      df: DataFrame,
      categoryCol: String,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: String = "v1"): DataFrame = {
    require(k > 0, "k must be positive")
    val reserved = Seq("__u", "__prio", "__rk")
    require(!df.columns.exists(reserved.contains),
      s"weightedReservoirPerCategory reserves ${reserved.mkString(",")}")
    import org.apache.spark.sql.expressions.Window
    val u = conv(substring(
      md5(concat_ws(":", lit(seed), col(idCol).cast("string")).cast("binary")),
      1, 15), 16, 10)
      .cast("long").cast("double") / lit(1152921504606846976.0d) // 2^60
    val w = Window.partitionBy(categoryCol)
      .orderBy(col("__prio").desc, col(idCol))
    df.where(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__prio",
        round(pow(u, lit(1.0d) / col(weightCol).cast("double")), 6))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .withColumnsRenamed(Map("__prio" -> "priority", "__rk" -> "rk"))
  }

  /** Per-key TOKEN budget cap — "no source/domain contributes more than
    * `budget` tokens": within each key, walk documents in the deterministic
    * md5(id) order and keep a document iff it STARTS inside the budget
    * (cumulative tokens before it < budget), so every key keeps at least
    * one document and the kept mass overshoots by at most one document —
    * the same greedy boundary rule as Sharding.assignShards.
    *
    * One keyed shuffle (running sum window per key); no driver state, no
    * dependence on the partition layout. The classic C4/CC-pipeline
    * domain-cap, complementary to sampleBudgetCapped: that one levels
    * DOCUMENT counts across categories under a global budget, this one
    * bounds TOKEN mass per key independently. */
  def capTokensPerKey(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(!df.columns.contains("__before"),
      "capTokensPerKey reserves the column name __before")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__before", sum(col(tokenCol)).over(w) - col(tokenCol))
      .where(col("__before") < budget)
      .drop("__before")
  }

  /** Budget-capped (UniMax-style) quotas by water-filling: given a total
    * document budget, small categories are kept WHOLE and large ones are
    * capped at the common level L that exhausts the budget —
    * Σ min(n_c, L) = budget. Walk categories ascending by size; at each
    * step the candidate level is the remaining budget spread evenly over
    * the remaining categories, and the first level not exceeding the
    * current category's size is THE level (it only rises while categories
    * fit under it). Category cardinality is metadata-sized, so the counts
    * collect to the driver like temperatureRates. Quotas are floor(L) —
    * up to m-1 budget slots may go unused (documented; no nondeterministic
    * remainder spreading). */
  def budgetCappedQuotas(
      df: DataFrame,
      categoryCol: String,
      budget: Long): Map[String, Long] = {
    val counts = df.groupBy(categoryCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    waterFill(counts.toSeq, budget)
  }

  /** The pure water-filling allocation behind budgetCappedQuotas
    * (factored out for direct property testing). */
  private[graft] def waterFill(
      counts: Seq[(String, Long)],
      budget: Long): Map[String, Long] = {
    val sorted = counts.sortBy { case (c, n) => (n, c) }
    val m = sorted.length
    var pre = 0L
    var level = Double.PositiveInfinity
    var i = 0
    var found = false
    while (i < m && !found) {
      val li = (budget - pre).toDouble / (m - i).toDouble
      if (li <= sorted(i)._2) { level = li; found = true }
      else pre += sorted(i)._2
      i += 1
    }
    val cap = math.floor(level)
    sorted.map { case (c, n) =>
      c -> math.max(0L, math.min(n.toDouble, cap).toLong)
    }.toMap
  }

  /** WEIGHTED token-budget waterfill — the mixture-planning step of a
    * pretraining recipe: split a token budget across sources in target
    * proportions, cap each source at its availability, and redistribute
    * every capped source's shortfall among the uncapped ones (still in
    * proportion) — the classic waterfilling solution, fully distributed
    * (no driver collect, unlike budgetCappedQuotas' category-map variant)
    * and EXACT: the allocation is integer end to end and sums to the
    * budget to the token.
    *
    * budget = ⌊Σ size · budgetPpm / 10⁶⌋. Sources are ordered by exact
    * availability/weight ratio via the cross-multiplied key
    * a·(weightLcm/w) — `weightLcm` must be a common multiple of every
    * weight (checked in-plan with a raising guard), which keeps the sort
    * key integral, so the capped set is a PREFIX of that order and is
    * found with one window pass: the first row whose availability covers
    * its fair share of the remaining budget ends the capped prefix.
    * Uncapped shares are w·R div W with the remainder distributed by
    * largest integer fraction (ties by group key) — the exact
    * largest-remainder method, so Σ alloc = budget always.
    *
    * Output per group: (group, available, weight, alloc, util_ppm).
    * All cross-products ride decimal(38,0) (oracle: HUGEINT), so corpora
    * to ~10¹⁶ tokens with weights to 10⁵ cannot overflow.
    *
    * Scale shape: ONE keyed aggregation collapses the corpus to the
    * per-source frame; every window below is over that |sources|-row
    * frame — unpartitioned by design (sources are a bounded vocabulary;
    * a million-key "source" column is a different problem). */
  def weightedTokenWaterfill(
      df: DataFrame,
      group: Column,
      size: Column,
      weight: Column,
      budgetPpm: Long,
      weightLcm: Long): DataFrame =
    finishWaterfill(sourceSizes(df, group, size, weight), budgetPpm, weightLcm)

  /** The STATEFUL half of the waterfill: per-source (Σsize, weight) —
    * one growing long + one stable max per source, the aggregation state
    * Structured Streaming maintains incrementally
    * (streaming/StreamingWaterfill). */
  def sourceSizes(
      df: DataFrame,
      group: Column,
      size: Column,
      weight: Column): DataFrame =
    df.groupBy(group.cast("string").as("grp"))
      .agg(sum(size).as("sz"), max(weight).cast("long").as("w"))

  /** The stateless finishing view over the |sources|-row sizes: the
    * whole waterfill algebra. Shared by the batch planner and the
    * streaming twin's consumer — a LIVE allocation plan that re-solves
    * as the corpus grows. */
  def finishWaterfill(
      sizes: DataFrame,
      budgetPpm: Long,
      weightLcm: Long): DataFrame = {
    require(budgetPpm >= 1 && budgetPpm <= 999999,
      "weightedTokenWaterfill: budgetPpm in [1, 999999] (at 10⁶ take everything)")
    require(weightLcm >= 1, "weightedTokenWaterfill: weightLcm must be >= 1")
    val dec = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
    val all = w.partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val perSrc = sizes
      .select(col("grp"), col("sz").cast(dec).as("a"), col("w"))
      .where(col("a") > 0)
      // in-plan guard: a weight that does not divide weightLcm would make
      // the ratio key inexact — refuse loudly, from executors
      .where(assert_true(col("w") > 0 && lit(weightLcm) % col("w") === 0,
        lit(s"weightedTokenWaterfill: every weight must divide $weightLcm"))
        .isNull)
      .withColumn("kord", expr(s"a * ($weightLcm div w)").cast(dec))
    val ord = w.orderBy(col("kord"), col("grp"))
    val staged = perSrc
      .withColumn("__pos", row_number().over(ord))
      .withColumn("__prefA", coalesce(
        sum("a").over(ord.rowsBetween(Long.MinValue, -1)), lit(0).cast(dec)))
      .withColumn("__wsuf",
        sum("w").over(ord.rowsBetween(0, Long.MaxValue)).cast(dec))
      .withColumn("__b",
        expr(s"(sum(a) OVER () * $budgetPpm) div 1000000").cast(dec))
      // capped test under the "everything before me capped" hypothesis;
      // the first failure ends the capped prefix (B < Σa guarantees the
      // last row always fails, so __bound is never null)
      .withColumn("__t",
        col("a") * col("__wsuf") < (col("__b") - col("__prefA")) * col("w"))
      .withColumn("__bound",
        min(when(!col("__t"), col("__pos"))).over(all))
      .withColumn("capped", col("__pos") < col("__bound"))
      .withColumn("__acap", coalesce(
        sum(when(col("capped"), col("a"))).over(all), lit(0).cast(dec)))
      .withColumn("__wunc",
        sum(when(!col("capped"), col("w"))).over(all).cast(dec))
      .withColumn("__r", col("__b") - col("__acap"))
      .withColumn("__base",
        when(col("capped"), lit(0L))
          .otherwise(expr("(__r * w) div __wunc")))
      .withColumn("__frac",
        when(col("capped"), lit(-1).cast(dec))
          .otherwise(expr("(__r * w) % __wunc")))
      .withColumn("__left",
        col("__r") - sum(when(!col("capped"), col("__base")).otherwise(0L))
          .over(all))
      .withColumn("__rnk",
        row_number().over(w.orderBy(col("capped"), desc("__frac"), col("grp"))))
    staged.select(
      col("grp"),
      col("a").cast("long").as("available"),
      col("w").as("weight"),
      when(col("capped"), col("a").cast("long"))
        .otherwise(col("__base") +
          when(col("__rnk") <= col("__left"), 1L).otherwise(0L))
        .as("alloc"))
      .withColumn("util_ppm",
        expr("(cast(alloc as decimal(38,0)) * 1000000) div available"))
  }

  /** Apply budget-capped quotas with the md5-rank selection of
    * stratifiedExactK: deterministic, layout-independent, and quota-exact
    * per category. The quota table is category-cardinality-sized and
    * broadcasts into the rank filter. */
  def sampleBudgetCapped(
      df: DataFrame,
      categoryCol: String,
      idCol: String,
      budget: Long): DataFrame = {
    val quotas = budgetCappedQuotas(df, categoryCol, budget)
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val qDf = spark.createDataFrame(quotas.toSeq).toDF(categoryCol, "__q")
    val w = Window.partitionBy(categoryCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .join(broadcast(qDf), Seq(categoryCol))
      .where(col("__rk") <= col("__q"))
      .drop("__rk", "__q")
  }

  /** Half-life step-decay sampling — freshness weighting for a corpus with
    * a time axis: a row's keep probability halves for every `halfLifeMicros`
    * of age relative to the NEWEST row in the dataset (anchoring to the data
    * maximum, not wall-clock, keeps the operator a pure function of its
    * input). Age epoch k = floor(age_us / halfLifeMicros); keep probability
    * 2^-k.
    *
    * Determinism contract: the accept test is INTEGER end to end — the
    * 32-bit md5(id) draw (same family as sampleByRates) is compared against
    * the threshold 2^32 >> k as an 8-hex-char string, so unlike an
    * exp(-age/τ) weight there is no transcendental whose last ulp could
    * differ between engines. k = 0 keeps unconditionally (the 9-hex-char
    * threshold 2^32 would otherwise be string-truncated); k is capped at 33
    * where the threshold is 0 and nothing survives.
    *
    * Scale shape: the max-timestamp anchor is a 1-row broadcast; the rest is
    * a shuffle-free scan-side filter. Output keeps the input columns plus
    * (decay_epochs, weight) — weight = 2^-k is an exact binary fraction. */
  def timeDecaySample(
      df: DataFrame,
      tsCol: String,
      idCol: String,
      halfLifeMicros: Long): DataFrame = {
    require(halfLifeMicros > 0, "half-life must be positive")
    require(!df.columns.contains("__max_us") && !df.columns.contains("__k"),
      "timeDecaySample reserves the column names __max_us and __k")
    val anchor = df.agg(max(unix_micros(col(tsCol))).as("__max_us"))
    df.crossJoin(broadcast(anchor))
      // integer `div`, not fp `/`: µs ages can exceed the 2^53 double range
      .withColumn("__k",
        least(expr(s"(__max_us - unix_micros(`$tsCol`)) div ${halfLifeMicros}L"),
          lit(33L)).cast("int"))
      .where(col("__k") === 0 ||
        substring(md5(col(idCol).cast("string")), 1, 8) <
          lpad(lower(hex(expr("shiftright(4294967296L, __k)"))), 8, "0"))
      .withColumn("decay_epochs", col("__k").cast("long"))
      .withColumn("weight",
        expr("shiftright(4294967296L, __k)").cast("double") / lit(4294967296.0))
      .drop("__max_us", "__k")
  }

  /** Temperature-derived rates: acceptance r_c ∝ n_c^(1/T - 1), scaled so
    * the largest rate is `maxRate` — the standard multinomial temperature
    * reweighting (T=1 keeps everything proportional/unchanged; T→∞ levels
    * categories to equal KEPT counts). One tiny aggregation; category
    * cardinality is assumed metadata-sized (languages, sources). */
  def temperatureRates(
      df: DataFrame,
      categoryCol: String,
      temperature: Double,
      maxRate: Double = 1.0): Map[String, Double] = {
    require(temperature > 0, "temperature must be positive")
    val counts = df.groupBy(categoryCol).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return Map.empty
    val expo = 1.0 / temperature - 1.0
    val raw = counts.map { case (k, n) =>
      // T=2 fast path: 1/sqrt is a correctly-rounded IEEE op in every
      // engine, where pow(n, -0.5) may differ by an ulp between libms —
      // this keeps the common "temperature 2 rebalance" exactly replayable
      // (the x67 oracle depends on it); general T stays on pow.
      k -> (if (expo == -0.5) 1.0 / math.sqrt(n.toDouble)
            else math.pow(n.toDouble, expo))
    }
    val top = raw.values.max
    raw.map { case (k, v) => k -> math.min(1.0, v / top * maxRate) }
  }

  /** Domain-mixture reweighting by multiplicative weights (the
    * polynomial-weights update of Arora, Hazan & Kale 2012's MW survey;
    * the DoReMi-style "upweight the domains the proxy still loses on"
    * recipe of Xie et al. 2023, with MW's linear payoff in place of
    * exponentiated gradient so every step is EXACT INTEGER ppm — no
    * transcendental anywhere, the x232 Sinkhorn discipline):
    *
    *   payoff_d  = ℓ̄_d − ℓ̄_mix        (excess loss vs the current mixture)
    *   w_d      ←  w_d · (1 + η·payoff_d),  then renormalize to Σ = 10⁶
    *
    * `loss` must be a per-row rate in [0, 1] (quantized to ppm with
    * ⌊ℓ·10⁶ + 0.5⌋ and clamped — out-of-range inputs saturate rather
    * than destabilize the update; η ≤ 0.5 then keeps every factor
    * positive). Fixed `iters` rounds from the uniform mixture; all
    * arithmetic is truncating integer division, so the whole trajectory
    * replays bit-for-bit in SQL. Every weight is floored at 1 ppm after
    * both the update and the renormalization — truncation alone could
    * zero a small weight permanently (MW can never multiply a domain
    * back from 0), violating the all-weights-positive invariant of the
    * algorithm as published. The post-renormalization floor RELAXES the
    * sum invariant: Σ w_ppm lands in [10⁶ − K + 1, 10⁶ + K − 1] rather
    * than exactly 10⁶ (truncation loses up to 1 ppm per domain; the
    * floor adds up to 1 ppm per starved domain) — consumers needing an
    * exact simplex must renormalize on read. Output per domain:
    * (domain, n, loss_ppm, w_ppm, boost_ppm) with boost = w·K, the
    * final weight as ppm of the uniform share.
    *
    * Scale shape: ONE keyed aggregation to the |domains| frame, the
    * iterations run on that metadata-sized frame driver-side, and the
    * result is the weight table a sampler ([[sampleByRates]],
    * [[budgetCappedQuotas]]) consumes — corpus rows are touched once. */
  def mixtureMwWeights(
      df: DataFrame,
      domain: Column,
      loss: Column,
      etaPpm: Long = 300000L,
      iters: Int = 8): DataFrame = {
    require(etaPpm > 0L && etaPpm <= 500000L,
      "mixtureMwWeights: etaPpm in (0, 500000] keeps every MW factor positive")
    require(iters >= 1 && iters <= 64, "mixtureMwWeights: iters in [1, 64]")
    val cells = df.where(domain.isNotNull && loss.isNotNull)
      .groupBy(domain.cast("string").as("d"))
      .agg(
        count(lit(1)).as("n"),
        sum(greatest(least(
          floor(loss.cast("double") * lit(1000000.0d) + lit(0.5d)).cast("long"),
          lit(1000000L)), lit(0L))).as("sl"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val k = cells.length.toLong
    require(k >= 1L && k <= 100000L,
      "mixtureMwWeights: needs 1..1e5 non-empty domains")
    val lbar = cells.map { case (_, n, sl) => sl / n }
    var w = Array.fill(cells.length)(1000000L / k)
    var t = 0
    while (t < iters) {
      val sw = w.sum
      val swl = w.zip(lbar).map { case (wi, li) => wi * li }.sum
      val m = swl / sw
      val u = w.zip(lbar).map { case (wi, li) =>
        // floor at 1 ppm: truncation could zero a small weight (e.g.
        // w=1 with a below-mean factor), after which the multiplicative
        // update can never recover that domain — the textbook MW
        // invariant is that every weight stays positive
        math.max(1L, wi * (1000000L + etaPpm * (li - m) / 1000000L) / 1000000L)
      }
      val s = u.sum
      w = u.map(ui => math.max(1L, ui * 1000000L / s))
      t += 1
    }
    val s = df.sparkSession
    import s.implicits._
    cells.zipWithIndex.map { case ((d, n, _), i) =>
      (d, n, lbar(i), w(i), w(i) * k)
    }.toSeq.toDF("domain", "n", "loss_ppm", "w_ppm", "boost_ppm")
      .orderBy("domain")
  }
}
