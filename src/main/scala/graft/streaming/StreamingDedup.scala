package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming deduplication for a continuously-arriving document corpus —
  * the streaming leg of the training-data pipeline (the batch forms live in
  * operators/Dedup.scala).
  *
  * Scale posture: both operators keep state per content-key, bounded by the
  * event-time watermark, so the state store is O(distinct keys within the
  * window) regardless of stream length — the standard Structured-Streaming
  * state contract. The near-dup path streams the SAME banded-minhash
  * candidate generation as the batch operator (native kernels, equi-grouping
  * on band keys, never all-pairs).
  */
object StreamingDedup {

  /** Exact streaming dedup: keep the first document per content digest,
    * drop later identical bodies that arrive within the watermark horizon.
    * Built on dropDuplicatesWithinWatermark so Spark ages the digest state
    * out instead of accreting it forever. Input needs an event-time column. */
  def exactWithinWatermark(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__digest", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** One streamed document (id + text + event time). */
  final case class DocEvent(docId: Long, text: String, ts: Timestamp)

  /** A near-duplicate candidate: a new document colliding with an earlier
    * one in some minhash band. Exact similarity verification happens
    * downstream (batch join on the stored corpus), exactly like the batch
    * operator's candidates → verify split. */
  final case class NearDupCandidate(docId: Long, earlierDocId: Long, band: Int, ts: Timestamp)

  /** Keyed state: the first document seen in a (band, band_hash) bucket.
    * Public — the state encoder's generated code must reach the constructor. */
  final case class BandState(firstDocId: Long)

  /** Streaming MinHash-LSH candidate detection: each document explodes into
    * `bands` band-hash keys (native graft_shingle_hashes +
    * graft_minhash_bands kernels — the same family as Dedup, so streaming
    * and batch candidates agree); keyed state remembers the first document
    * per (band, band_hash) and every later arrival in the same bucket emits
    * a candidate pair. State is EVENT-TIME bounded: a bucket idle past the
    * watermark + `stateTtl` expires — the streaming analog of the banding
    * join's window, and the timeout mode that doesn't make the micro-batch
    * engine self-trigger (processing-time timers re-fire batches forever). */
  def minhashCandidates(
      docs: Dataset[DocEvent],
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      watermark: String = "10 minutes",
      stateTtlMs: Long = 10 * 60 * 1000L): Dataset[NearDupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    val banded = docs.toDF()
      .withWatermark("ts", watermark)
      .select(col("docId"), col("ts"),
        posexplode(call_function("graft_minhash_bands",
          call_function("graft_shingle_hashes", col("text"), lit(shingleSize)),
          lit(bands), lit(rowsPerBand))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
      .as[(Long, Timestamp, Int, Long)]

    banded
      .groupByKey { case (_, _, band, bandHash) => (band, bandHash) }
      .flatMapGroupsWithState[BandState, NearDupCandidate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, Long), rows: Iterator[(Long, Timestamp, Int, Long)],
         state: GroupState[BandState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy { case (id, ts, _, _) => (ts.getTime, id) }
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupCandidate]
            var first: Option[Long] = state.getOption.map(_.firstDocId)
            var maxTs = 0L
            sorted.foreach { case (id, ts, band, _) =>
              maxTs = math.max(maxTs, ts.getTime)
              first match {
                case Some(f) if f != id => out += NearDupCandidate(id, f, band, ts)
                case Some(_) => // same doc re-delivered
                case None => first = Some(id)
              }
            }
            first.foreach(f => state.update(BandState(f)))
            // Clamp above the current watermark: a timeout <= watermark is an
            // IllegalArgumentException that kills the whole streaming query.
            // Spark 4.1 drops late rows before this operator (verified by
            // StreamingDedupSpec's late-only test), but rows sitting exactly
            // at the watermark with a small/zero TTL would still trip it —
            // the clamp makes the operator safe under any TTL.
            if (maxTs > 0L) state.setTimeoutTimestamp(
              math.max(maxTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }
}
