package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Randomized cross-checks for the temporal operators against driver-side
  * reference implementations — the window/union constructions have
  * off-by-one surfaces (frame bounds, tag ordering, tie-breaks) that
  * hand-picked fixtures can miss. Spark runs once per generated dataset
  * (20 datasets × ~200 rows), the reference is a direct Scala fold. */
class TemporalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val genEvents: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 200)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(0L, 5L)
      tsMin <- Gen.choose(0L, 500L)
    } yield (key, tsMin))
  } yield rows.zipWithIndex.map { case ((k, t), i) => (k, i.toLong, t) }

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("sessionize matches a per-key driver fold for random event sets") {
    check(Prop.forAll(genEvents) { rows =>
      val df = rows.map { case (k, id, t) => (k, id, ts(t)) }
        .toDF("user_id", "event_id", "ts")
      val gapMin = 30L
      val got = Sessionize.sessionize(df, "user_id", "ts", "event_id",
        gapMicros = gapMin * 60 * 1000000)
        .select("user_id", "event_id", "session_idx")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

      // reference: sort each key by (ts, id), fold gaps
      val expected = rows.groupBy(_._1).flatMap { case (k, ev) =>
        val sorted = ev.sortBy(e => (e._3, e._2))
        var session = 0L
        var prev = Long.MinValue
        sorted.map { case (_, id, t) =>
          if (prev == Long.MinValue || t - prev > gapMin) session += 1
          prev = t
          (k, id) -> session
        }
      }
      got == expected
    })
  }

  test("termStats/tfIdf match driver-side reference counts on random corpora") {
    val genCorpus: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 60)
      docs <- Gen.listOfN(n, Gen.listOf(
        Gen.oneOf("the", "Fox", "jumps", "OVER", "dog", "a", "")).map(_.mkString(" ")))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

    check(Prop.forAll(genCorpus) { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = Vocabulary.termStats(df, "text", "doc_id")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

      val tokenized = docs.map { case (id, t) =>
        id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      }
      val tf = tokenized.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
      val dfreq = tokenized.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong)
      val expected = tf.keys.map(t => t -> (tf(t), dfreq(t))).toMap
      got == expected
    }, n = 15)
  }

  test("asofJoin matches a per-row reference scan for random join sets") {
    val genPair = for {
      l <- genEvents
      r <- genEvents
    } yield (l, r)
    check(Prop.forAll(genPair) { case (lRows, rRows) =>
      val left = lRows.map { case (k, id, t) => (id, k, ts(t)) }
        .toDF("event_id", "user_id", "ts")
      val right = rRows.map { case (k, id, t) => (k, ts(t), id, id * 1.5) }
        .toDF("user_id", "p_ts", "p_event_id", "p_value")

      val got = TemporalJoins.asofJoin(left, right, "user_id", "ts", "p_ts",
        "p_event_id", Seq("p_event_id", "p_value"))
        .select("event_id", "p_event_id")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap

      // reference: for each left row, max (ts, id) right row with ts <= left ts
      val expected = lRows.map { case (k, id, t) =>
        val m = rRows.filter(r => r._1 == k && r._3 <= t)
        id -> (if (m.isEmpty) None else Some(m.maxBy(r => (r._3, r._2))._2))
      }.toMap
      got == expected
    })
  }
}
