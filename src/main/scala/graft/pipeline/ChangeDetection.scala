package graft.pipeline

import java.time.Instant

/** E3/E4 — pure change-detection logic (reference:
  * crawl/preprocess_check_data.py:69-105, analysis/resource.py:150-293). */
object ChangeDetection {

  sealed trait Change
  case object HasChanged extends Change
  case object HasNotChanged extends Change
  case object NoGuess extends Change

  final case class ChangePayload(lastModifiedAt: Instant, detectionMethod: String)

  /** Minimal view of one check used by the cascade (headers pre-extracted,
    * like the reference's `headers->>` projection in D6). */
  final case class CheckView(
      createdAt: Instant,
      status: Option[Int],
      timeout: Boolean,
      lastModifiedHeader: Option[String],
      contentLengthHeader: Option[String],
      contentTypeHeader: Option[String],
      checksum: Option[String],
      detectedLastModifiedAt: Option[Instant])

  /** 2xx/3xx are valid; 429 is "our fault" → unknown (crawl/helpers.py:56-63). */
  def isValidStatus(status: Option[Int]): Option[Boolean] = status.flatMap {
    case 429 => None
    case s => Some(s >= 200 && s < 400)
  }

  /** E3 "has the check changed" predicate — first check ∨ status change ∨
    * availability lost ∨ timeout flip ∨ content-length/type change. */
  def hasCheckChanged(current: CheckView, last: Option[CheckView]): Boolean = last match {
    case None => true
    case Some(prev) =>
      val statusChanged = current.status != prev.status
      val noLongerAvailable =
        isValidStatus(prev.status).contains(true) && !isValidStatus(current.status).contains(true)
      val timeoutChanged = current.timeout != prev.timeout
      val contentChanged =
        current.contentLengthHeader != prev.contentLengthHeader ||
          current.contentTypeHeader != prev.contentTypeHeader
      statusChanged || noLongerAvailable || timeoutChanged || contentChanged
  }

  /** E4 cascade on early hints, in reference priority order:
    * harvest metadata → last-modified header → content-length diff.
    * `checks` is the last-2 window (newest first) from QueriesD6. */
  def detectChangeOnEarlyHints(
      harvestModifiedAt: Option[Instant],
      checks: Seq[CheckView],
      parseDate: String => Option[Instant],
      now: Instant): (Change, Option[ChangePayload]) = {
    if (checks.isEmpty) return (NoGuess, None)

    fromHarvest(harvestModifiedAt, checks) match {
      case (NoGuess, _) =>
        fromLastModifiedHeader(checks, parseDate) match {
          case (NoGuess, _) => fromContentLength(checks)
          case r => r
        }
      case r => r
    }
  }

  private def fromHarvest(
      harvestModifiedAt: Option[Instant],
      checks: Seq[CheckView]): (Change, Option[ChangePayload]) = {
    if (checks.length == 1) return (NoGuess, None)
    harvestModifiedAt match {
      case Some(h) if checks(1).detectedLastModifiedAt.contains(h) => (HasNotChanged, None)
      case Some(h) => (HasChanged, Some(ChangePayload(h, "harvest-resource-metadata")))
      case None => (NoGuess, None)
    }
  }

  private def fromLastModifiedHeader(
      checks: Seq[CheckView],
      parseDate: String => Option[Instant]): (Change, Option[ChangePayload]) = {
    val current = checks.head.lastModifiedHeader
    if (checks.length == 1 && current.isDefined)
      return parsed(current.get, parseDate)
    if (checks.length == 1 || current.isEmpty) return (NoGuess, None)
    if (current != checks(1).lastModifiedHeader) parsed(current.get, parseDate)
    else (HasNotChanged, None)
  }

  private def parsed(raw: String, parseDate: String => Option[Instant]): (Change, Option[ChangePayload]) =
    parseDate(raw) match {
      case Some(ts) => (HasChanged, Some(ChangePayload(ts, "last-modified-header")))
      case None => (NoGuess, None)
    }

  private def fromContentLength(checks: Seq[CheckView]): (Change, Option[ChangePayload]) = {
    if (checks.length <= 1 || checks.head.contentLengthHeader.isEmpty) return (NoGuess, None)
    if (checks.head.contentLengthHeader != checks(1).contentLengthHeader)
      (HasChanged, Some(ChangePayload(checks.head.createdAt, "content-length-header")))
    else (HasNotChanged, None)
  }

  /** Checksum fallback (analysis/resource.py:158-175). */
  def fromChecksum(
      newChecksum: String,
      last: Option[CheckView],
      now: Instant): (Change, Option[ChangePayload]) = last match {
    case Some(prev) if !prev.checksum.contains(newChecksum) =>
      (HasChanged, Some(ChangePayload(now, "computed-checksum")))
    case _ => (NoGuess, None)
  }
}
