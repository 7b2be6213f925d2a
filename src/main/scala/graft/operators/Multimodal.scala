package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (driver contract "scale extras").
  *
  * Media (image/audio/video) travel as opaque `binary` columns with a typed
  * metadata struct; decode / feature-extraction / frame-sampling run as
  * `mapPartitions` batch jobs (the Scala analog of Pandas-UDF/mapInPandas
  * pipelines) so each executor touches a bounded batch of blobs at a time.
  *
  * The actual codec work is STUBBED — this container has no image/audio
  * libraries — behind `MediaCodec`, with a deterministic fake implementation.
  * Everything Spark-side (schema, partitioning, batch iteration, output
  * encoders) is real and tested; swapping in a real codec is a one-object
  * change.
  */
object Multimodal {

  /** Typed metadata carried next to the blob. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),   // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", MetaSchema)))

  /** ===== STUB SEAM =====
    * Deterministic fake codec: derives "decoded" properties purely from the
    * byte content, so tests and plans are stable. A real deployment replaces
    * this object with JNI/javacv-backed implementations — signatures stay. */
  object MediaCodec {
    /** "Decode" → (format, width, height): stub reads sizes from a hash. */
    def probe(bytes: Array[Byte]): (String, Int, Int) = {
      val h = java.util.Arrays.hashCode(bytes)
      val w = 64 + math.abs(h % 1024)
      ("stub", w, 64 + math.abs((h / 1024) % 1024))
    }

    /** Feature vector: deterministic pseudo-embedding from byte chunks.
      * Real impl: a vision/audio encoder over the decoded frame/samples. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        var acc = 1125899906842597L
        var j = i
        while (j < bytes.length) { acc = 31 * acc + bytes(j); j += dim }
        out(i) = (java.lang.Math.floorMod(acc, 2000L) / 1000.0f) - 1.0f
        i += 1
      }
      out
    }

    /** Frame sampling for video blobs: every strideBytes-th slice. Stub
      * returns the byte offsets it would decode. */
    def frameOffsets(bytes: Array[Byte], strideBytes: Int): Seq[Long] =
      (0L until bytes.length.toLong by strideBytes.toLong).toSeq

    /** 64-bit average-hash (aHash, the blockhash family) perceptual
      * fingerprint. The stub treats the RAW byte array as the decoded
      * luma plane: 64 contiguous blocks (block(i) = i·64 div n — sizes
      * differ by ≤ 1), bit b set iff block b's mean byte value strictly
      * exceeds the blob's global mean. The comparison is the integer
      * cross-multiplication sum_b·n > total·cnt_b — no division, no fp,
      * so any engine replays the hash bit-for-bit (overflow-safe for
      * blobs < ~2^27 bytes: 255·n² < 2^63). A real deployment decodes +
      * downscales to an 8×8 luma grid first and applies the same bit
      * rule — signatures stay. Empty blobs hash to 0. */
    def aHash64(bytes: Array[Byte]): Long = {
      val n = bytes.length
      if (n == 0) return 0L
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var total = 0L
      var i = 0
      while (i < n) {
        val b = (i.toLong * 64L / n).toInt
        val v = (bytes(i) & 0xFF).toLong
        sums(b) += v
        cnts(b) += 1
        total += v
        i += 1
      }
      var h = 0L
      var b = 0
      while (b < 64) {
        if (sums(b) * n > total * cnts(b)) h |= (1L << b)
        b += 1
      }
      h
    }
  }

  /** Attach decoded metadata to a media table: one mapPartitions pass, each
    * partition streaming its blobs through the codec (bounded memory). */
  def withProbedMeta(media: DataFrame): DataFrame = {
    val outSchema = MediaSchema
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "kind", "bytes", "meta").mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val (fmt, w, h) = MediaCodec.probe(bytes)
        val oldMeta = r.getAs[Row]("meta")
        val dur = if (oldMeta == null) null else oldMeta.getAs[java.lang.Long]("duration_ms")
        Row(r.getAs[Long]("media_id"), r.getAs[String]("kind"), bytes,
          Row(fmt, w, h, dur))
      }
    }(enc)
  }

  /** Feature extraction: (media_id, embedding array<float>). Batch shape =
    * one partition of blobs per task; pair with repartitionBySize so a few
    * huge videos don't skew one task. */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType))))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "bytes").mapPartitions { it =>
      it.map { r =>
        // the schema permits bytes=null (metadata-only rows) — treat as empty
        val bytes = Option(r.getAs[Array[Byte]]("bytes")).getOrElse(Array.emptyByteArray)
        Row(r.getAs[Long]("media_id"), MediaCodec.features(bytes, dim).toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video rows: explode to (media_id, frame_no, offset). */
  def sampleFrames(media: DataFrame, strideBytes: Int = 4096): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("byte_offset", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.where(col("kind") === "video").select("media_id", "bytes").mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getAs[Long]("media_id")
        val bytes = Option(r.getAs[Array[Byte]]("bytes")).getOrElse(Array.emptyByteArray)
        MediaCodec.frameOffsets(bytes, strideBytes)
          .zipWithIndex.map { case (off, i) => Row(id, i, off) }
      }
    }(enc)
  }

  /** Perceptual fingerprints for a media table: (media_id, phash), one
    * codec pass per partition (the withProbedMeta batch shape). */
  def perceptualHashes(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "bytes").mapPartitions { it =>
      it.map { r =>
        val bytes = Option(r.getAs[Array[Byte]]("bytes")).getOrElse(Array.emptyByteArray)
        Row(r.getAs[Long]("media_id"), MediaCodec.aHash64(bytes))
      }
    }(enc)
  }

  /** Perceptual near-duplicate pairs over a media table — the multimodal
    * column as a first-class dedup citizen: every (id_a, id_b, dist)
    * with id_a < id_b and Hamming(phash_a, phash_b) ≤ maxDist.
    *
    * EXACT by pigeonhole, not probabilistic: the 64 hash bits split into
    * maxDist + 1 disjoint bands, and a pair differing in ≤ maxDist bits
    * has all its differing bits inside ≤ maxDist bands — so at least one
    * band matches VERBATIM and the band-bucket equi-join surfaces the
    * pair with probability 1 (the classic Hamming-LSH exactness point;
    * same role as x248's full-recall parameter setting, but here it
    * holds for every maxDist by construction). Precision is exact too:
    * every candidate is verified with bit_count(xor) ≤ maxDist.
    *
    * Scale shape: one codec scan to the (media_id, phash) frame
    * (16 bytes/row, persisted), an explode to maxDist+1 band keys per
    * blob, a band-bucket self-join (candidate volume Σ bucket² — bounded
    * by hash entropy, never all-pairs), and a popcount verify on the
    * 8-byte hashes. Nothing blob-sized travels past the codec scan.
    * Caller epilogue: releaseCaches() after materializing. */
  def perceptualNearDuplicates(media: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 16,
      "perceptualNearDuplicates: maxDist in [0, 16]")
    val hashed = tracked(perceptualHashes(media).persist())
    val nBands = maxDist + 1
    val w = 64 / nBands
    val rem = 64 % nBands
    // band i covers wi = w (+1 for the first rem bands) bits at offset
    // off; arithmetic shift then mask isolates the field (sign-extension
    // bits die under the mask)
    val bandCols = (0 until nBands).map { i =>
      val wi = w + (if (i < rem) 1 else 0)
      val off = i * w + math.min(i, rem)
      val mask = if (wi == 64) -1L else (1L << wi) - 1L
      struct(lit(i).as("band"),
        expr(s"shiftright(phash, $off) & ${mask}L").as("bits"))
    }
    val banded = hashed.select(col("media_id"),
      explode(array(bandCols: _*)).as("bk"))
      .select(col("media_id"), col("bk.band").as("band"),
        col("bk.bits").as("bits"))
    val a = banded.select(col("band"), col("bits"), col("media_id").as("id_a"))
    val b = banded.select(col("band"), col("bits"), col("media_id").as("id_b"))
    // corpus-scaled frames throughout — pin shuffled joins so no AQE
    // compressed-size estimate ever turns a row-scaled side into a
    // broadcast build (the FuzzyLinkage.similarityJoinAuto sf10 lesson)
    a.hint("shuffle_hash").join(b, Seq("band", "bits"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
      .join(hashed.select(col("media_id").as("id_a"), col("phash").as("ph_a"))
        .hint("shuffle_hash"), Seq("id_a"))
      .join(hashed.select(col("media_id").as("id_b"), col("phash").as("ph_b"))
        .hint("shuffle_hash"), Seq("id_b"))
      .withColumn("dist",
        expr("bit_count(ph_a ^ ph_b)").cast("long"))
      .where(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  // perceptualNearDuplicates persists the 16-byte/row hash frame (feeds
  // both the banding and the verify) — the FuzzyLinkage.releaseCaches
  // contract: release on the building thread once materialized.
  private val caches = new CacheRegistry
  private def tracked(df: DataFrame): DataFrame = caches.tracked(df)

  /** Unpersist every frame cached by THIS THREAD's perceptual-dedup
    * calls since its last release. */
  def releaseCaches(): Unit = caches.releaseAll()

  /** Size-aware repartitioning: blobs bucketed by log2(size) then spread
    * round-robin inside a bucket — keeps a task from accumulating only
    * giant blobs (the classic multimodal skew). */
  def repartitionBySize(media: DataFrame, partitions: Int): DataFrame =
    media
      .withColumn("__szb", round(log2(greatest(length(col("bytes")), lit(1)))))
      .repartition(partitions, col("__szb"), pmod(xxhash64(col("media_id")), lit(partitions)))
      .drop("__szb")
}
