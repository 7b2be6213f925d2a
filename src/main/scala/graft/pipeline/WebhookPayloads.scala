package graft.pipeline

import java.time.Instant

/** C8 — the exact webhook document shapes the reference pushes to the
  * metadata platform, as pure functions (crawl/preprocess_check_data.py:36-55,
  * analysis/resource.py:75-130, analysis/csv.py:87-106).
  *
  * Values use `null` (not Option) inside the maps so a JSON serialization of
  * the document matches the reference field-for-field. */
object WebhookPayloads {

  /** crawl/helpers.py:56-63 — availability verdict for a status code: false
    * for missing, None ("can't say — it's our fault") for 429, else 2xx/3xx. */
  def isValidStatus(status: Option[Int]): Option[Boolean] = status match {
    case None => Some(false)
    case Some(429) => None
    case Some(s) => Some(s >= 200 && s < 400)
  }

  private def orNull(o: Option[Any]): Any = o.orNull

  /** The `check:*` document sent when a check outcome changed
    * (crawl/preprocess_check_data.py:36-55). Headers must already be
    * lowercased (HeaderUtils.normalizeHeaders). */
  def checkDocument(
      status: Option[Int],
      timeout: Boolean,
      error: Option[String],
      headers: Map[String, String],
      now: Instant): Map[String, Any] = {
    val contentLength = headers.get("content-length").flatMap(_.toLongOption).filter(_ != 0L)
    Map(
      "check:available" -> orNull(isValidStatus(status)),
      "check:status" -> orNull(status),
      "check:timeout" -> timeout,
      "check:date" -> now.toString,
      "check:error" -> orNull(error),
      "check:headers:content-type" ->
        orNull(headers.get("content-type").map(HeaderUtils.contentTypeMime)),
      "check:headers:content-length" -> orNull(contentLength))
  }

  /** The `analysis:*` download-analysis extras (analysis/resource.py:75-90,
    * 124-130): size/checksum/mime when the file downloaded, the size-cap
    * error when it refused. */
  def analysisDocument(
      contentLength: Option[Long],
      checksum: Option[String],
      mimeType: Option[String],
      error: Option[String]): Map[String, Any] =
    error match {
      case Some(e) => Map("analysis:error" -> e)
      case None => Map(
        "analysis:content-length" -> orNull(contentLength),
        "analysis:checksum" -> orNull(checksum),
        "analysis:mime-type" -> orNull(mimeType))
    }

  /** The `analysis:parsing:*` document notify_udata sends after every CSV
    * analysis attempt, success or failure (analysis/csv.py:87-106). */
  def parsingDocument(
      parsingError: Option[String],
      startedAt: Option[Instant],
      finishedAt: Option[Instant],
      parquetUrl: Option[String] = None,
      parquetSize: Option[Long] = None,
      csvToParquet: Boolean = false): Map[String, Any] = {
    val base = Map(
      "analysis:parsing:error" -> orNull(parsingError),
      "analysis:parsing:started_at" -> orNull(startedAt.map(_.toString)),
      "analysis:parsing:finished_at" -> orNull(finishedAt.map(_.toString)))
    if (csvToParquet)
      base ++ Map(
        "analysis:parsing:parquet_url" -> orNull(parquetUrl),
        "analysis:parsing:parquet_size" -> orNull(parquetSize))
    else base
  }
}
