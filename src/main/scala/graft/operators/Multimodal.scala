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

  /** Size-aware repartitioning: blobs bucketed by log2(size) then spread
    * round-robin inside a bucket — keeps a task from accumulating only
    * giant blobs (the classic multimodal skew). */
  def repartitionBySize(media: DataFrame, partitions: Int): DataFrame =
    media
      .withColumn("__szb", round(log2(greatest(length(col("bytes")), lit(1)))))
      .repartition(partitions, col("__szb"), pmod(xxhash64(col("media_id")), lit(partitions)))
      .drop("__szb")
}
