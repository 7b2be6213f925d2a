package graft.pipeline

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function specs mirroring tests/test_crawl/test_crawl.py + test_backoff.py. */
class SchedulingSpec extends AnyFunSuite {

  private val now = Instant.parse("2024-06-01T00:00:00Z")

  test("first check or changed → earliest delay (12h)") {
    assert(Scheduling.calculateNextCheck(hasCheckChanged = true, Some(now), None, now)
      == now.plusSeconds(12 * 3600))
    assert(Scheduling.calculateNextCheck(hasCheckChanged = false, None, None, now)
      == now.plusSeconds(12 * 3600))
  }

  test("unchanged: smallest delay covering time since modification") {
    def nc(hoursAgo: Long) = Scheduling.calculateNextCheck(
      hasCheckChanged = false, Some(now.minusSeconds(1)),
      Some(now.minusSeconds(hoursAgo * 3600)), now)
    assert(nc(5) == now.plusSeconds(12 * 3600))    // ≤12h ago → 12h
    assert(nc(20) == now.plusSeconds(24 * 3600))   // ≤24h → 24h
    assert(nc(100) == now.plusSeconds(168 * 3600)) // ≤7d → 7d
    assert(nc(300) == now.plusSeconds(720 * 3600)) // ≤30d → 30d
    assert(nc(10000) == now.plusSeconds(720 * 3600)) // beyond max → max
  }

  test("unchanged without modification date falls back to last check date") {
    val r = Scheduling.calculateNextCheck(
      hasCheckChanged = false, Some(now.minusSeconds(50 * 3600)), None, now)
    assert(r == now.plusSeconds(168 * 3600))
  }

  test("backoff: request-count threshold") {
    assert(Scheduling.isDomainBackoff(180, None, now)._1)
    assert(Scheduling.isDomainBackoff(1000, None, now)._2.startsWith("Too many requests"))
    assert(!Scheduling.isDomainBackoff(179, None, now)._1)
  }

  test("backoff: 429 on latest call and ratelimit ratios") {
    def chk(status: Option[Int], remain: Option[String], limit: Option[String],
        ageSec: Long = 10) =
      Some(Scheduling.BackoffCheck(now.minusSeconds(ageSec), status, remain, limit))
    assert(Scheduling.isDomainBackoff(0, chk(Some(429), None, None), now)._1)
    assert(!Scheduling.isDomainBackoff(0, chk(Some(200), Some("50"), Some("100")), now)._1)
    // ≤10% remaining within backoff period → backoff
    assert(Scheduling.isDomainBackoff(0, chk(Some(200), Some("5"), Some("100")), now)._1)
    // same ratio but older than the backoff period → no backoff
    assert(!Scheduling.isDomainBackoff(0, chk(Some(200), Some("5"), Some("100"), 500), now)._1)
    // limit -1 → explicitly fine; zero remaining → backoff
    assert(!Scheduling.isDomainBackoff(0, chk(Some(200), Some("5"), Some("-1")), now)._1)
    assert(Scheduling.isDomainBackoff(0, chk(Some(200), Some("0"), Some("100")), now)._1)
    // unparsable headers → ignored
    assert(!Scheduling.isDomainBackoff(0, chk(Some(200), Some("x"), Some("y")), now)._1)
  }
}

class ChangeDetectionSpec extends AnyFunSuite {
  import ChangeDetection._

  private val now = Instant.parse("2024-06-01T00:00:00Z")
  private def view(
      lastMod: Option[String] = None,
      clen: Option[String] = None,
      status: Option[Int] = Some(200),
      detected: Option[Instant] = None,
      checksum: Option[String] = None) =
    CheckView(now, status, timeout = false, lastMod, clen, Some("text/csv"), checksum, detected)

  private val parse: String => Option[Instant] =
    s => scala.util.Try(Instant.parse(s)).toOption

  test("hasCheckChanged: first check, status flip, availability loss, content change") {
    assert(hasCheckChanged(view(), None))
    assert(hasCheckChanged(view(status = Some(404)), Some(view(status = Some(200)))))
    assert(hasCheckChanged(view(clen = Some("2")), Some(view(clen = Some("1")))))
    assert(!hasCheckChanged(view(), Some(view())))
  }

  test("cascade priority: harvest beats headers") {
    val h = Instant.parse("2024-05-01T00:00:00Z")
    val checks = Seq(view(lastMod = Some("2024-05-20T00:00:00Z")), view())
    val (st, payload) = detectChangeOnEarlyHints(Some(h), checks, parse, now)
    assert(st == HasChanged && payload.get.detectionMethod == "harvest-resource-metadata")
    // harvest date already detected → HAS_NOT_CHANGED even with header diff
    val settled = Seq(view(lastMod = Some("x")), view(detected = Some(h)))
    assert(detectChangeOnEarlyHints(Some(h), settled, parse, now)._1 == HasNotChanged)
  }

  test("last-modified header: single check, change, and no-change") {
    val single = Seq(view(lastMod = Some("2024-05-20T00:00:00Z")))
    val (st, p) = detectChangeOnEarlyHints(None, single, parse, now)
    assert(st == HasChanged && p.get.detectionMethod == "last-modified-header")
    val changed = Seq(view(lastMod = Some("2024-05-20T00:00:00Z")),
      view(lastMod = Some("2024-05-10T00:00:00Z")))
    assert(detectChangeOnEarlyHints(None, changed, parse, now)._1 == HasChanged)
    val same = Seq(view(lastMod = Some("2024-05-20T00:00:00Z")),
      view(lastMod = Some("2024-05-20T00:00:00Z")))
    assert(detectChangeOnEarlyHints(None, same, parse, now)._1 == HasNotChanged)
  }

  test("content-length fallback") {
    val changed = Seq(view(clen = Some("100")), view(clen = Some("90")))
    val (st, p) = detectChangeOnEarlyHints(None, changed, parse, now)
    assert(st == HasChanged && p.get.detectionMethod == "content-length-header")
    val same = Seq(view(clen = Some("100")), view(clen = Some("100")))
    assert(detectChangeOnEarlyHints(None, same, parse, now)._1 == HasNotChanged)
    assert(detectChangeOnEarlyHints(None, Seq(view()), parse, now)._1 == NoGuess)
  }

  test("checksum diff") {
    assert(fromChecksum("abc", Some(view(checksum = Some("def"))), now)._1 == HasChanged)
    assert(fromChecksum("abc", Some(view(checksum = Some("abc"))), now)._1 == NoGuess)
  }
}
