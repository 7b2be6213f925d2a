package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ImportanceWeights

/** The DSIR serving shape on a stream: fit the target-vs-raw log-ratio
  * table ONCE offline (it is ≤ buckets rows — a broadcastable plan
  * constant), then weight each incoming micro-batch against it inside
  * foreachBatch — the score-as-it-lands filter an intake leg runs to admit
  * only target-like documents. Like the LM leg, scoring is a plain batch
  * aggregation scoped to the micro-batch: no streaming state at all. */
class StreamingDsirSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches weight against the pre-fit ratios, identical to batch scoring") {
    val target = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "a quick red fox runs past the sleepy dog")
    ).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "the quick brown fox naps near the dog"),
      (2L, "quarterly revenue guidance exceeded estimates"),
      (3L, "molecular dynamics simulations converge slowly")
    ).toDF("doc_id", "text")
    val ratios = ImportanceWeights.fitLogRatios(target, raw, "text", "doc_id")
      .cache()
    ratios.count()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.Map[Long, Double]()
    val query = input.toDF().toDF("doc_id", "text")
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        ImportanceWeights.score(batch, "text", "doc_id", ratios)
          .collect()
          .foreach(r => collected.synchronized {
            collected(r.getLong(0)) = r.getDouble(1)
          })
      }
      .start()
    try {
      input.addData((10L, "the quick brown fox naps near the dog"))
      query.processAllAvailable()
      input.addData((11L, "quarterly revenue guidance exceeded estimates"))
      query.processAllAvailable()
    } finally query.stop()

    val batchWeights = ImportanceWeights.score(
      Seq((10L, "the quick brown fox naps near the dog"),
        (11L, "quarterly revenue guidance exceeded estimates")).toDF("doc_id", "text"),
      "text", "doc_id", ratios)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    assert(collected.toMap == batchWeights, s"$collected vs $batchWeights")
    // target-like text outweighs off-target, exactly as in the batch spec
    assert(collected(10L) > collected(11L))
    ratios.unpersist()
  }
}
