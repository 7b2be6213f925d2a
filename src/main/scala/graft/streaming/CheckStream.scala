package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming forms of the crawl pipeline's analytics (SURVEY §2-E1,
  * D7): the reference's crawl loop is a poll-sleep batch driver; on Spark the
  * same semantics stream incrementally with watermarked state.
  *
  * Scale: state is per-key (domain / resource_id) and watermark-bounded, so
  * the state store stays O(active keys within the window) regardless of
  * stream length. */
object CheckStream {

  /** One streamed check event (the append side of the checks log). */
  final case class CheckEvent(
      resourceId: String,
      domain: String,
      createdAt: Timestamp,
      status: Option[Int],
      timeout: Boolean,
      contentLength: Option[String],
      contentType: Option[String])

  final case class ChangeEvent(
      resourceId: String,
      createdAt: Timestamp,
      reason: String)

  /** D7 streaming: per-domain request counts over a sliding window — the
    * backoff counter fed continuously. Late events beyond the watermark are
    * dropped (same information loss as the reference's periodic SQL count). */
  def domainRequestCounts(
      events: DataFrame,
      windowLength: String = "360 seconds",
      slide: String = "60 seconds",
      watermark: String = "120 seconds"): DataFrame =
    events
      .withWatermark("createdAt", watermark)
      .groupBy(col("domain"), window(col("createdAt"), windowLength, slide))
      .agg(count(lit(1)).as("n_req"))
      .select(col("domain"), col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n_req"))

  /** E3 streaming: per-resource change detection with keyed state — emits a
    * ChangeEvent whenever a check differs from the previous one for the same
    * resource (status flip / availability loss / timeout flip / content
    * change), mirroring has_check_changed (preprocess_check_data.py:69-105).
    * State is event-time bounded: a resource idle past the watermark +
    * `stateTtlMs` expires, so the store stays O(recently-active resources)
    * instead of O(all resources ever seen). */
  def detectChanges(
      checks: Dataset[CheckEvent],
      watermark: String = "1 hour",
      stateTtlMs: Long = 30L * 24 * 3600 * 1000): Dataset[ChangeEvent] = {
    import checks.sparkSession.implicits._
    checks
      .withWatermark("createdAt", watermark)
      .groupByKey(_.resourceId)
      .flatMapGroupsWithState[CheckEvent, ChangeEvent](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (resourceId: String, events: Iterator[CheckEvent], state: GroupState[CheckEvent]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = events.toSeq.sortBy(_.createdAt.getTime)
            val out = scala.collection.mutable.ArrayBuffer.empty[ChangeEvent]
            var prev: Option[CheckEvent] = state.getOption
            sorted.foreach { e =>
              changeReason(e, prev).foreach { reason =>
                out += ChangeEvent(resourceId, e.createdAt, reason)
              }
              prev = Some(e)
            }
            prev.foreach { p =>
              state.update(p)
              // Clamped above the watermark: a timeout <= watermark throws
              // and kills the query (reachable with boundary-timestamp rows
              // and a small TTL; see StreamingDedup's identical clamp).
              state.setTimeoutTimestamp(
                math.max(p.createdAt.getTime + stateTtlMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Continuous ingestion of check events into the MetaStore: each
    * micro-batch lands under a batch=<id> partition written with Overwrite —
    * foreachBatch is at-least-once, so a replayed batch overwrites its own
    * directory instead of appending duplicates (the standard
    * idempotent-foreachBatch recipe). created_date rides along for the
    * time-window partition pruning the batch queries rely on. */
  def sinkToStore(
      checks: Dataset[CheckEvent],
      store: graft.store.MetaStore,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    checks.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[CheckEvent], batchId: Long) =>
        batch.toDF()
          .withColumn("created_date", to_date(col("createdAt")))
          .write
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"${store.tablePath("checks_stream")}/batch=$batchId")
        ()
      }
      .start()
  }

  /** Pure predicate shared by batch and streaming paths. Availability loss
    * is checked BEFORE the generic status diff — equal statuses imply equal
    * validity, so the old ordering made "no-longer-available" unreachable. */
  def changeReason(current: CheckEvent, last: Option[CheckEvent]): Option[String] = last match {
    case None => Some("first-check")
    case Some(p) =>
      def valid(s: Option[Int]) = s.exists(v => v >= 200 && v < 400)
      if (valid(p.status) && !valid(current.status)) Some("no-longer-available")
      else if (current.status != p.status) Some("status-changed")
      else if (current.timeout != p.timeout) Some("timeout-changed")
      else if (current.contentLength != p.contentLength || current.contentType != p.contentType)
        Some("content-changed")
      else None
  }
}
