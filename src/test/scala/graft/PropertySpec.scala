package graft

import java.time.Instant

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SmartDateUtil
import graft.pipeline.Scheduling

/** Property tests (SURVEY §5 rebuild strategy: new value-add layer). */
class PropertySpec extends AnyFunSuite {

  /** scalatestplus bridge isn't on the classpath — run scalacheck directly. */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("date parse round-trip: any valid date survives ISO and dd/MM/yyyy") {
    val genDate = for {
      y <- Gen.choose(1900, 2099)
      m <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28)
    } yield (y, m, d)
    check(Prop.forAll(genDate) { case (y, m, d) =>
      val iso = f"$y%04d-$m%02d-$d%02d"
      val fr = f"$d%02d/$m%02d/$y%04d"
      val p1 = SmartDateUtil.parse(iso)
      val p2 = SmartDateUtil.parse(fr)
      p1.isDefined && p1 == p2 &&
        p1.get.toLocalDate.toString == iso
    })
  }

  test("date parse never throws on arbitrary strings") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      SmartDateUtil.parse(s); true
    })
    check(Prop.forAll(Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString)) { s =>
      SmartDateUtil.parse(s); true
    })
  }

  test("invalid calendar dates are rejected, not wrapped") {
    assert(SmartDateUtil.parse("2023-02-31").isEmpty)
    assert(SmartDateUtil.parse("31/13/2023").isEmpty) // month 13 both orders invalid
    assert(SmartDateUtil.parse("00/00/2023").isEmpty)
  }

  test("next-check date is strictly in the future and bounded by max delay") {
    val genInstants = for {
      base <- Gen.choose(0L, 4102444800L) // 1970..2100
      lastOff <- Gen.choose(0L, 400L * 24 * 3600)
      modOff <- Gen.option(Gen.choose(0L, 400L * 24 * 3600))
      changed <- Gen.oneOf(true, false)
    } yield (Instant.ofEpochSecond(base + 500L * 24 * 3600), lastOff, modOff, changed)
    check(Prop.forAll(genInstants) { case (now, lastOff, modOff, changed) =>
      val next = Scheduling.calculateNextCheck(
        changed, Some(now.minusSeconds(lastOff)),
        modOff.map(now.minusSeconds), now)
      val maxDelay = Scheduling.CheckDelaysHours.last * 3600
      next.isAfter(now) && !next.isAfter(now.plusSeconds(maxDelay))
    })
  }

  test("next-check is monotone in staleness (older modification → later delay bucket)") {
    val now = Instant.parse("2024-06-01T00:00:00Z")
    val delays = (1L to 1000L).by(7).map { hoursAgo =>
      Scheduling.calculateNextCheck(hasCheckChanged = false,
        Some(now.minusSeconds(1)), Some(now.minusSeconds(hoursAgo * 3600)), now)
    }
    assert(delays.sliding(2).forall { case Seq(a, b) => !b.isBefore(a); case _ => true })
  }

  test("sniffer total-function: arbitrary bytes either parse or raise the contract errors") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray)) { bytes =>
      val f = java.nio.file.Files.createTempFile("fuzz", ".csv")
      try {
        java.nio.file.Files.write(f, bytes)
        try { graft.detect.CsvSniffer.sniff(f.toString); true }
        catch { case e: graft.detect.CsvSniffer.ParseException =>
          e.getMessage.contains("list index out of range") ||
            e.getMessage.contains("Number of columns is not even")
        }
      } finally java.nio.file.Files.deleteIfExists(f)
    })
  }

  test("shingle/ngram hash sets: permutation-independent cardinality bounds") {
    import org.apache.spark.unsafe.types.UTF8String
    check(Prop.forAll(Gen.alphaLowerStr.suchThat(_.length >= 5)) { s =>
      val g = graft.functions.GraftHashUtil.ngramHashes(UTF8String.fromString(s), 5)
      val xs = g.toLongArray().toSeq
      xs == xs.sorted && xs.distinct == xs && xs.length <= math.max(s.length - 4, 1)
    })
  }

  test("chunk-index arithmetic: full coverage, bounded windows, exact overlap") {
    // mirrors Chunking.chunkByTokens AND the x27 oracle: last chunk index
    // = max(0, floor((n - maxT + stride - 1) / stride)), chunk i covers
    // tokens [i*stride+1, min(i*stride+maxT, n)]
    val gen = for {
      n <- Gen.choose(1, 5000)
      maxT <- Gen.choose(1, 600)
      overlap <- Gen.choose(0, 599).suchThat(_ < maxT)
    } yield (n, maxT, overlap)
    check(Prop.forAll(gen) { case (n, maxT, overlap) =>
      val stride = maxT - overlap
      val last = math.max(0L, math.floorDiv(n - maxT + stride - 1, stride))
      val ranges = (0L to last).map(i =>
        (i * stride + 1, math.min(i * stride + maxT, n.toLong)))
      val covered = ranges.forall { case (a, b) => a <= b && b - a + 1 <= maxT } &&
        ranges.head._1 == 1L && ranges.last._2 == n.toLong &&
        ranges.sliding(2).forall {
          case Seq((_, b1), (a2, _)) => a2 <= b1 + 1 // no gaps
          case _ => true
        }
      val overlapOk = ranges.sliding(2).forall {
        case Seq((_, b1), (a2, b2)) =>
          // consecutive chunks overlap by exactly `overlap` tokens except a
          // short tail (which still starts stride after its predecessor)
          b2 == n.toLong || (b1 - a2 + 1) == overlap
        case _ => true
      }
      covered && overlapOk
    })
  }

  test("water-filling quotas: budget-tight, count-bounded, level-flat") {
    val waterFill = graft.operators.MixtureSampling.waterFill _
    val gen = for {
      m <- Gen.choose(1, 12)
      counts <- Gen.listOfN(m, Gen.choose(0L, 10000L))
      budget <- Gen.choose(0L, 40000L)
    } yield (counts.zipWithIndex.map { case (n, i) => (s"c$i", n) }, budget)
    check(Prop.forAll(gen) { case (counts, budget) =>
      val q = waterFill(counts, budget)
      val total = counts.map(_._2).sum
      val sumQ = q.values.sum
      val byCat = counts.toMap
      val withinCounts = q.forall { case (c, v) => v >= 0 && v <= byCat(c) }
      val budgetTight =
        if (budget >= total) sumQ == total
        // floor() may strand < m slots; never overshoot
        else sumQ <= budget && (budget - sumQ) < q.size.toLong.max(1L)
      val capped = q.filter { case (c, v) => v < byCat(c) }.values
      val uncapped = q.filter { case (c, v) => v == byCat(c) }
      // all capped categories sit at one level, at or above every
      // uncapped category's full size
      val levelFlat = capped.isEmpty || (capped.toSet.size == 1 &&
        uncapped.keys.forall(c => byCat(c) <= capped.head))
      withinCounts && budgetTight && levelFlat
    })
  }
}
