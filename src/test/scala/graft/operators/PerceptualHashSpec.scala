package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.SparkSpec

/** aHash64 + perceptualNearDuplicates (x249's operator): hand-computed
  * bit rules, pigeonhole exactness vs brute force, edge blobs. */
class PerceptualHashSpec extends SparkSpec {

  private def mediaFrame(rows: Seq[(Long, Array[Byte])]) = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bytes", BinaryType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, b) => Row(id, b) }, 2),
      schema)
  }

  test("aHash64 hand-computed bit rule") {
    // two bytes: position 0 -> block 0 (value 0), position 1 -> block 32
    // (value 255); total 255, n 2. Block 0: 0*2 > 255*1 false -> bit 0.
    // Block 32: 255*2 > 255*1 true -> bit 32. Empty blocks stay 0.
    assert(Multimodal.MediaCodec.aHash64(Array[Byte](0, -1)) == (1L << 32))
    // uniform bytes: no block mean strictly exceeds the global mean
    assert(Multimodal.MediaCodec.aHash64(Array.fill[Byte](128)(7)) == 0L)
    // empty blob hashes to 0
    assert(Multimodal.MediaCodec.aHash64(Array.emptyByteArray) == 0L)
    // signedness: 0xFF must read as 255, not -1
    val ramp = Array.tabulate[Byte](256)(i => i.toByte)
    val h = Multimodal.MediaCodec.aHash64(ramp)
    // ascending ramp: block b holds bytes 4b..4b+3 (sum 16b+6, count 4),
    // total 32640 — bit set iff (16b+6)·256 > 32640·4 iff b >= 32: the
    // upper half exactly
    assert(java.lang.Long.bitCount(h) == 32,
      s"ramp popcount ${java.lang.Long.bitCount(h)}")
    assert(h == -4294967296L) // bits 32..63
  }

  test("identical blobs pair at distance 0; every pair verifies its hash") {
    val blobA = Array.tabulate[Byte](300)(i => (i % 251).toByte)
    val blobB = Array.tabulate[Byte](300)(i => ((i * 37 + 11) % 83).toByte)
    val media = mediaFrame(Seq(1L -> blobA, 2L -> blobA, 3L -> blobB))
    val out = Multimodal.perceptualNearDuplicates(media, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    Multimodal.releaseCaches()
    val hs = Multimodal.perceptualHashes(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains((1L, 2L, 0L)))
    out.foreach { case (ia, ib, d) =>
      assert(d == java.lang.Long.bitCount(hs(ia) ^ hs(ib)) && d <= 3L)
    }
  }

  test("pigeonhole banding is EXACT: operator equals brute-force Hamming") {
    val dir = "/root/testdata/sf0.001"
    val media = graft.queries.Tables.documents(spark, dir)
      .where(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("bytes"))
    for (k <- Seq(0, 3, 5)) {
      val got = Multimodal.perceptualNearDuplicates(media, maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      Multimodal.releaseCaches()
      val hashes = Multimodal.perceptualHashes(media)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = (for {
        (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= k
      } yield (ia, ib, d.toLong)).toSet
      assert(got == want,
        s"maxDist=$k: got ${got.size} pairs, brute force ${want.size}")
    }
  }

  test("near-identical blobs (one byte flipped) land within the radius") {
    val base = Array.tabulate[Byte](4096)(i => ((i * 131) % 256).toByte)
    val tweaked = base.clone()
    tweaked(100) = (tweaked(100) + 90).toByte // nudges one block's mean
    val out = Multimodal.perceptualNearDuplicates(
      mediaFrame(Seq(10L -> base, 11L -> tweaked)), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    Multimodal.releaseCaches()
    assert(out.contains((10L, 11L)),
      "single-byte perturbation should stay within Hamming 3")
  }
}
