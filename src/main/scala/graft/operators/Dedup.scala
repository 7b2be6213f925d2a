package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (driver contract "scale extras"; SURVEY §7.8).
  *
  * All four variants are pure DataFrame pipelines — no UDFs, no driver
  * materialization — so they scale by partitioning:
  *
  *   - exact:       one hash-groupBy shuffle on a content digest
  *   - minhash LSH: shingle → seeded-xxhash signature → banded bucket join →
  *                  exact-Jaccard verification of candirates only
  *   - simhash:     64-bit sign-aggregate fingerprint + pigeonhole segment
  *                  join for hamming-distance candidates
  *   - ngram-Jaccard: inverted-index self-join with common-count pruning
  *
  * The LSH/banding parameters trade recall vs cost exactly as in the
  * published MinHash literature (Broder '97; MMDS ch.3): P(candidate) =
  * 1-(1-s^r)^b for similarity s with b bands of r rows.
  */
object Dedup {

  // functions.shiftleft/shiftright only accept Int amounts in the Scala API;
  // the SQL builtins take full expressions — call through by name.
  private def shl(x: Column, n: Column): Column = call_function("shiftleft", x, n)
  private def shr(x: Column, n: Column): Column = call_function("shiftright", x, n)

  /** Exact duplicate groups by content digest. One shuffle; digest-first so
    * wide text never travels — only (digest, id). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("digest"))
      .groupBy("digest")
      .agg(
        count(lit(1)).as("n_dups"),
        min(col(idCol)).as("keep_id"),
        sort_array(collect_list(col(idCol))).as("ids"))
      .where(col("n_dups") > 1)

  /** Keep one row per exact content digest (the dedup "apply" side):
    * row_number over digest, keep first by id — deterministic. */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** Whitespace word shingles of size k, distinct, lowercased. */
  def shingles(textCol: Column, k: Int): Column = {
    val tokens = split(lower(trim(textCol)), "\\s+")
    array_distinct(
      filter(
        transform(
          sequence(lit(0), greatest(size(tokens) - k, lit(0))),
          i => concat_ws(" ", slice(tokens, i + 1, lit(k)))),
        s => s =!= ""))
  }

  /** MinHash signature: for each seed, min over shingles of a seeded xxhash64.
    * numHashes columns of cheap codegen'd hashing — one scan, no shuffle. */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(shinglesCol, s => xxhash64(s, seed))))

  /** MinHash-LSH near-duplicate pairs.
    *
    * numHashes = bands*rowsPerBand. Pipeline: signature → explode bands
    * (b rows/doc, each carrying only (band, bandHash, id)) → self-join within
    * (band, bandHash) buckets → distinct candidate pairs → verify exact
    * Jaccard on shingle sets. Only candidates pay the verification cost.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold. */
  def minhashNearDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.8): DataFrame = {

    val numHashes = bands * rowsPerBand
    val withSig = df
      .select(col(idCol).as("id"), shingles(col(textCol), shingleSize).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))

    // band id + hash of the band's slice of the signature
    val banded = withSig.select(
      col("id"), col("sh"),
      posexplode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))

    val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash fingerprint of the token multiset: per bit position,
    * sign of Σ over tokens of ±1 (bit set in the token's hash or not). */
  def simhash64(textCol: Column): Column = {
    val tokens = split(lower(trim(textCol)), "\\s+")
    val bitSums = aggregate(
      tokens,
      array_repeat(lit(0), 64),
      (acc, t) =>
        zip_with(acc,
          transform(sequence(lit(0), lit(63)),
            i => when(shr(xxhash64(t), i).bitwiseAND(1) === 1, 1).otherwise(-1)),
          (x, y) => x + y))
    aggregate(
      transform(sequence(lit(0), lit(63)),
        i => when(element_at(bitSums, i + 1) > 0, shl(lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-duplicate pairs with hamming distance ≤ maxDistance.
    *
    * Pigeonhole candidate generation: split the 64-bit fingerprint into
    * maxDistance+1 segments; two fingerprints within distance d must agree
    * on ≥1 segment → equi-join per segment, union, verify true distance.
    * Equi-joins keep this shuffle-friendly (no O(n²) compare). */
  def simhashNearDuplicates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxDistance: Int = 3): DataFrame = {

    val segments = maxDistance + 1
    val segBits = 64 / segments
    val withFp = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("fp"))

    val segmented = withFp.select(
      col("id"), col("fp"),
      posexplode(transform(sequence(lit(0), lit(segments - 1)),
        s => shr(col("fp"), s * segBits)
          .bitwiseAND(if (segBits >= 64) lit(-1L) else lit((1L << segBits) - 1)))))
      .withColumnsRenamed(Map("pos" -> "seg", "col" -> "seg_val"))

    val a = segmented.select(col("seg"), col("seg_val"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = segmented.select(col("seg"), col("seg_val"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("seg", "seg_val"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .where(col("hamming") <= maxDistance)
      .select("id_a", "id_b", "hamming")
  }

  /** Character-ngram Jaccard similarity pairs via inverted index:
    * explode ngrams → self-join on ngram → common-count per pair →
    * |A∩B|/(|A|+|B|-|A∩B|). minCommon prunes the pair space before the
    * expensive per-pair aggregation. */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 5,
      threshold: Double = 0.7,
      minCommon: Int = 2): DataFrame = {

    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val gramsDf = df.select(
      col(idCol).as("id"),
      array_distinct(
        transform(
          sequence(lit(0), greatest(length(norm) - n, lit(0))),
          i => norm.substr(i + 1, lit(n)))).as("grams"))
      .where(size(col("grams")) > 0)

    val inverted = gramsDf.select(col("id"), size(col("grams")).as("sz"), explode(col("grams")).as("g"))
    val a = inverted.select(col("g"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = inverted.select(col("g"), col("id").as("id_b"), col("sz").as("sz_b"))
    a.join(b, Seq("g"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "sz_a", "sz_b")
      .agg(count(lit(1)).as("common"))
      .where(col("common") >= minCommon)
      .withColumn("jaccard",
        col("common").cast("double") / (col("sz_a") + col("sz_b") - col("common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
