package graft.pipeline

import java.time.{Duration, Instant}

/** Pure scheduling/decision functions (SURVEY §2-E; no Spark, unit-testable).
  * Config defaults mirror config_default.toml:24-49. */
object Scheduling {

  /** Escalating re-check delays in hours (config_default.toml:46). */
  val CheckDelaysHours: Seq[Long] = Seq(12L, 24L, 168L, 720L)
  val BackoffNbReq: Int = 180
  val BackoffPeriodSeconds: Long = 360L
  val CoolOffPeriodSeconds: Long = 86400L

  /** E6 — crawl/calculate_next_check.py:20-44.
    *
    * changed/first check → earliest delay; otherwise the smallest delay that
    * covers the time since the last known modification (falling back to the
    * last check time), capped at the maximum delay. */
  def calculateNextCheck(
      hasCheckChanged: Boolean,
      lastCheckAt: Option[Instant],
      lastModifiedAt: Option[Instant],
      now: Instant): Instant = {
    val delays = CheckDelaysHours
    if (lastCheckAt.isEmpty || hasCheckChanged)
      return now.plus(Duration.ofHours(delays.head))
    val since = Duration.between(lastModifiedAt.getOrElse(lastCheckAt.get), now)
    val hours = delays.find(d => since.compareTo(Duration.ofHours(d)) <= 0).getOrElse(delays.last)
    now.plus(Duration.ofHours(hours))
  }

  /** One prior check's fields relevant to backoff (headers lowercased). */
  final case class BackoffCheck(
      createdAt: Instant,
      status: Option[Int],
      ratelimitRemaining: Option[String],
      ratelimitLimit: Option[String])

  /** D7/backoff — crawl/helpers.py:66-139. Decision given (a) how many checks
    * hit the domain within the backoff period and (b) the latest check within
    * the cool-off period. Returns (backoff?, reason). */
  def isDomainBackoff(
      nbReqInBackoffPeriod: Long,
      latestInCoolOff: Option[BackoffCheck],
      now: Instant,
      noBackoff: Boolean = false): (Boolean, String) = {
    if (noBackoff) return (false, "")
    if (nbReqInBackoffPeriod >= BackoffNbReq)
      return (true, s"Too many requests: $nbReqInBackoffPeriod")
    latestInCoolOff match {
      case Some(c) if c.status.contains(429) =>
        (true, "429 status code has been returned on the latest call")
      case Some(c) =>
        val parsed = for {
          r <- c.ratelimitRemaining.flatMap(_.toDoubleOption)
          l <- c.ratelimitLimit.flatMap(_.toDoubleOption)
        } yield (r, l)
        parsed match {
          case Some((_, -1.0)) => (false, "")
          case Some((r, l)) if r == 0.0 || l == 0.0 => (true, "X-ratelimit reached")
          case Some((r, l))
              if r / l <= 0.1 &&
                c.createdAt.isAfter(now.minusSeconds(BackoffPeriodSeconds)) =>
            (true, "X-ratelimit reached")
          case _ => (false, "")
        }
      case None => (false, "")
    }
  }
}
