package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.encoders.RowEncoder

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    val rows = Seq(
      Row(1L, "image", Array.fill[Byte](512)(7), Row(null, null, null, null)),
      Row(2L, "image", Array.fill[Byte](2048)(3), Row(null, null, null, null)),
      Row(3L, "video", Array.fill[Byte](10000)(1), Row(null, null, null, 9000L))
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.MediaSchema)
  }

  test("probe fills metadata deterministically via the stub codec") {
    val out = Multimodal.withProbedMeta(media).orderBy("media_id").collect()
    assert(out.length == 3)
    val meta = out.head.getAs[Row]("meta")
    assert(meta.getAs[String]("format") == "stub")
    assert(meta.getAs[Int]("width") >= 64)
    // duration preserved from input meta
    assert(out(2).getAs[Row]("meta").getAs[Long]("duration_ms") == 9000L)
    // deterministic: same input → same probe
    val again = Multimodal.withProbedMeta(media).orderBy("media_id").collect()
    assert(out.map(_.getAs[Row]("meta")).sameElements(again.map(_.getAs[Row]("meta"))) ||
      out.map(_.getAs[Row]("meta").toString).toSeq == again.map(_.getAs[Row]("meta").toString).toSeq)
  }

  test("feature extraction yields fixed-dim float embeddings") {
    val feats = Multimodal.extractFeatures(media, dim = 16).orderBy("media_id").collect()
    assert(feats.length == 3)
    feats.foreach { r =>
      val e = r.getSeq[Float](r.fieldIndex("embedding"))
      assert(e.length == 16)
      assert(e.forall(v => v >= -1.0f && v <= 1.0f))
    }
  }

  test("frame sampling only over video rows, stride-spaced offsets") {
    val frames = Multimodal.sampleFrames(media, strideBytes = 4096).collect()
    assert(frames.forall(_.getAs[Long]("media_id") == 3L))
    assert(frames.map(_.getAs[Long]("byte_offset")).toSeq == Seq(0L, 4096L, 8192L))
  }

  test("size-aware repartitioning keeps all rows") {
    val rep = Multimodal.repartitionBySize(media, 4)
    assert(rep.count() == 3)
    assert(rep.rdd.getNumPartitions == 4)
  }
}
