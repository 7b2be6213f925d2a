package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash-LSH parameter planner — the capacity-planning step run BEFORE
  * a 100 TB dedup job: given the corpus's observed similarity spectrum at
  * and above the dedup threshold, score every (bands b, rows-per-band r)
  * split of the signature budget by its analytic detection probability
  *   P(s) = 1 − (1 − s^r)^b          (Leskovec–Rajaraman–Ullman, MMDS §3)
  * and pick the CHEAPEST split (fewest bands = fewest bucket entries =
  * least shuffle volume in the band join) that still meets the recall
  * target. Getting this wrong is the classic 100 TB dedup failure: r too
  * small floods the bucket join with sub-threshold candidates, b too
  * small silently drops true near-duplicates.
  *
  * Exactness contract: GIVEN the spectrum histogram, the plan arithmetic
  * replays bit-for-bit in SQL — each verified pair's s_ppm is exact
  * integer (10⁶·|∩| div |∪|, binned per percent) and every power in
  * P(s) is an exact integer square-chain on the ppm grid (x ← x² div
  * 10⁶, exponents are powers of two by construction since b·r =
  * numPerms is a power of two) — no fp pow anywhere.
  *
  * Spectrum caveat (banding-conditional): the histogram is built from
  * the banded-LSH candidate set (spectrumBands × spectrumRowsPerBand),
  * so pairs the spectrum banding itself misses are absent — at the
  * default 16×4 a pair at s = 0.5 has a ~36 % miss probability, and a
  * corpus dense in borderline pairs will under-weight those bins (the
  * sub-threshold region is analytic, not sampled, so subhalf_ppm is
  * unaffected). An oracle computing the EXACT all-pairs spectrum agrees
  * only when the banded candidate set contains every pair ≥ threshold;
  * raise spectrumBands (more bands at fixed rows-per-band = higher
  * recall, more spectrum-pass cost) when the planning corpus sits near
  * the threshold. The plan table is a capacity estimate, not an exact
  * recall guarantee.
  *
  * Scale shape: the pair spectrum reuses the banded-join + exact-verify
  * pipeline (only candidates pay verification; the x07 class), collapses
  * to a ≤ 101-row percent histogram in one aggregation, and the 8-config
  * grid arithmetic runs on that metadata. */
object LshPlanner {

  /** Exact integer square-chain: base^exp on the ppm grid with
    * truncating division after every squaring step. `exp` must be a
    * power of two (or 1). Mirrors [[sqlPowChain]] exactly. */
  private[operators] def powChain(base: Long, exp: Int): Long = {
    require(exp >= 1 && Integer.bitCount(exp) == 1,
      "powChain: exp must be a power of two")
    var x = base
    var e = exp
    while (e > 1) { x = x * x / 1000000L; e >>= 1 }
    x
  }

  /** The SQL text of [[powChain]] — shared with the oracle so both
    * engines evaluate the identical expression tree. `divOp` is "div"
    * for Spark SQL, "//" for DuckDB. */
  private[graft] def sqlPowChain(base: String, exp: Int, divOp: String): String = {
    require(exp >= 1 && Integer.bitCount(exp) == 1,
      "sqlPowChain: exp must be a power of two")
    var x = base
    var e = exp
    while (e > 1) { x = s"((($x) * ($x)) $divOp 1000000)"; e >>= 1 }
    x
  }

  /** P(s)·10⁶ = 10⁶ − (10⁶ − s^r)^b for s in ppm. */
  private[operators] def detectPpm(sPpm: Long, b: Int, r: Int): Long =
    1000000L - powChain(1000000L - powChain(sPpm, r), b)

  /** [[detectPpm]] for the oracle builder (graft.queries). */
  private[graft] def detectPpmPublic(sPpm: Long, b: Int, r: Int): Long =
    detectPpm(sPpm, b, r)

  /** The SQL text of [[detectPpm]]. */
  private[graft] def sqlDetectPpm(s: String, b: Int, r: Int, divOp: String): String =
    s"(1000000 - ${sqlPowChain(s"(1000000 - ${sqlPowChain(s, r, divOp)})", b, divOp)})"

  /** Plan table for a `numPerms`-permutation signature: one row per
    * (b, r) split with b·r = numPerms, scored against the corpus's
    * verified pair spectrum at `thresholdPpm`:
    *   recall_ppm   — Σ cnt(bin)·P(mid(bin)) div Σ cnt over bins ≥ the
    *                  threshold (expected detected share of true pairs)
    *   subhalf_ppm  — P(threshold/2), the analytic sub-threshold
    *                  candidate-rate proxy (bucket-join cost pressure)
    *   chosen       — the minimal-bands config meeting `targetPpm`
    * The spectrum comes from the proven banded+verified x07 pipeline
    * (spectrum pairs are s ≥ threshold by construction — the planner
    * needs exactly that range). */
  def lshPlan(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      spectrumBands: Int = 16,
      spectrumRowsPerBand: Int = 4,
      thresholdPpm: Long = 500000L,
      numPerms: Int = 128,
      targetPpm: Long = 950000L): DataFrame = {
    require(numPerms >= 2 && Integer.bitCount(numPerms) == 1,
      "lshPlan: numPerms must be a power of two")
    require(thresholdPpm >= 1L && thresholdPpm <= 1000000L,
      "lshPlan: thresholdPpm in [1, 1e6]")
    graft.functions.GraftFunctions.register(df.sparkSession)

    // verified pair spectrum (the minhashNearDuplicates pipeline with
    // exact integer jaccard), collapsed to the percent histogram
    val hashed = df
      .select(col(idCol).as("id"),
        call_function("graft_shingle_hashes", col(textCol),
          lit(shingleSize)).as("bh"))
      .where(size(col("bh")) > 0)
      .persist()
    // finally-released: a failure anywhere in the candidate/verify path
    // (e.g. the ANSI div in s_ppm) must not leak the cached frame
    val hist = try {
      val banded = hashed.select(
        col("id"),
        posexplode(call_function("graft_minhash_bands",
          col("bh"), lit(spectrumBands), lit(spectrumRowsPerBand))))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
      val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
      val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"))
      val candidates = a.join(b, Seq("band", "band_hash"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b")
      val sets = hashed.select(col("id"), col("bh"), size(col("bh")).as("hsz"))
      candidates
        .join(sets.withColumnsRenamed(
          Map("id" -> "id_a", "bh" -> "bh_a", "hsz" -> "hsz_a")), Seq("id_a"))
        .join(sets.withColumnsRenamed(
          Map("id" -> "id_b", "bh" -> "bh_b", "hsz" -> "hsz_b")), Seq("id_b"))
        .withColumn("common",
          call_function("graft_intersect_count", col("bh_a"), col("bh_b")))
        .withColumn("s_ppm", expr(
          "(CAST(common AS BIGINT) * 1000000) div " +
            "CAST(hsz_a + hsz_b - common AS BIGINT)"))
        .where(col("s_ppm") >= thresholdPpm)
        .groupBy(expr("s_ppm div 10000").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
    } finally hashed.unpersist(blocking = false)

    def mid(bin: Long): Long = math.min(bin * 10000L + 5000L, 1000000L)
    val configs = Iterator.iterate(1)(_ * 2).takeWhile(_ <= numPerms)
      .map(r => (numPerms / r, r)).toSeq
    val totalCnt = hist.map(_._2).sum
    val rows = configs.map { case (nb, r) =>
      val recall =
        if (totalCnt == 0L) -1L
        else {
          val det = hist.map { case (bin, cnt) =>
            BigInt(cnt) * BigInt(detectPpm(mid(bin), nb, r))
          }.sum
          (det / BigInt(totalCnt)).toLong
        }
      val subhalf = detectPpm(thresholdPpm / 2L, nb, r)
      (nb, r, recall, subhalf)
    }
    val qualifying = rows.filter(_._3 >= targetPpm).map(_._1)
    val chosenBands = if (qualifying.isEmpty) -1 else qualifying.min
    val s = df.sparkSession
    import s.implicits._
    rows.map { case (nb, r, recall, subhalf) =>
      (nb.toLong, r.toLong,
        if (recall < 0) None else Some(recall),
        subhalf, nb == chosenBands)
    }.toDF("bands", "rows_per_band", "recall_ppm", "subhalf_ppm", "chosen")
      .orderBy("bands")
  }
}
