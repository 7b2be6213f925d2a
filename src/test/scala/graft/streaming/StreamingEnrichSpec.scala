package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamingEnrichSpec extends SparkSpec {

  private def ts(min: Int) = Timestamp.valueOf(f"2024-06-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  final case class Doc(docId: Long, text: String, ts: Timestamp)
  final case class Meta(docId: Long, source: String, mts: Timestamp)

  test("inner stream-stream join matches docs to late metadata within the bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = MemoryStream[Doc]
    val meta = MemoryStream[Meta]
    val joined = StreamingEnrich.joinWithMetadata(
      docs.toDF(), meta.toDF(), "docId", "ts", "mts",
      watermark = "5 minutes", maxDelayed = "10 minutes")
    val query = joined.writeStream.format("memory").queryName("enrich_inner")
      .outputMode(OutputMode.Append()).start()

    docs.addData(Doc(1L, "alpha", ts(0)), Doc(2L, "beta", ts(1)))
    query.processAllAvailable()
    // metadata for doc 1 arrives a batch later, 4 min after the doc event;
    // doc 3's metadata arrives BEFORE its doc
    meta.addData(Meta(1L, "web", ts(4)), Meta(3L, "books", ts(5)))
    query.processAllAvailable()
    docs.addData(Doc(3L, "gamma", ts(6)))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("enrich_inner").select("docId", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(out == Set(1L -> "web", 3L -> "books"), out.toString)
  }

  test("left_outer emits null-metadata docs once the watermark closes the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = MemoryStream[Doc]
    val meta = MemoryStream[Meta]
    val joined = StreamingEnrich.joinWithMetadata(
      docs.toDF(), meta.toDF(), "docId", "ts", "mts",
      watermark = "2 minutes", maxDelayed = "5 minutes", joinType = "left_outer")
    val query = joined.writeStream.format("memory").queryName("enrich_outer")
      .outputMode(OutputMode.Append()).start()

    docs.addData(Doc(1L, "alpha", ts(0)), Doc(2L, "beta", ts(0)))
    meta.addData(Meta(1L, "web", ts(1)))
    query.processAllAvailable()
    // push BOTH watermarks far past doc 2's join window so the engine can
    // prove no metadata can still arrive for it
    docs.addData(Doc(9L, "sentinel", ts(60)))
    meta.addData(Meta(9L, "sentinel", ts(60)))
    query.processAllAvailable()
    docs.addData(Doc(10L, "tick", ts(62)))
    meta.addData(Meta(10L, "tick", ts(62)))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("enrich_outer").select("docId", "source").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains("web"))
    assert(out.contains(2L) && out(2L).isEmpty,
      s"doc 2 must emit with null metadata after the window closes: $out")
  }
}
