package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SequenceMiningSpec extends SparkSpec {

  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.map { case (id, u, t) =>
      (id, u, t, new Timestamp(1700000000000L + id * 60000L))
    }.toDF("event_id", "user_id", "event_type", "ts")

  test("frequentSequences: hand-computed trigram supports") {
    // user 1: a b c a b c ; user 2: a b c ; user 3: x y z
    val df = ev(
      (1, 1, "a"), (2, 1, "b"), (3, 1, "c"), (4, 1, "a"), (5, 1, "b"), (6, 1, "c"),
      (7, 2, "a"), (8, 2, "b"), (9, 2, "c"),
      (10, 3, "x"), (11, 3, "y"), (12, 3, "z"))
    val out = SequenceMining.frequentSequences(df, col("user_id"),
      col("event_type"), col("ts"), col("event_id"), k = 3, minUsers = 2)
      .collect()
    // only (a,b,c) appears for ≥2 users: users {1,2}, 3 occurrences total
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getString(2)) == ("a", "b", "c"))
    assert(r.getLong(3) == 2L && r.getLong(4) == 3L)
  }

  test("frequentSequences: k=2 counts contiguous pairs, not gapped ones") {
    val df = ev((1, 1, "a"), (2, 1, "x"), (3, 1, "b"),
      (4, 2, "a"), (5, 2, "x"), (6, 2, "b"))
    val out = SequenceMining.frequentSequences(df, col("user_id"),
      col("event_type"), col("ts"), col("event_id"), k = 2, minUsers = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    // (a,b) is gapped — must NOT appear; (a,x) and (x,b) do
    assert(out.toSet == Set(("a", "x", 2L), ("x", "b", 2L)))
  }

  test("markovStationary: two-state chain matches the hand-replayed " +
    "integer recurrence exactly") {
    // a -> b (cnt 3), b -> a (cnt 1): each step b inherits a's mass up to
    // div-by-out dust, a inherits b's exactly — replay the recurrence
    val df = ev((1, 1, "a"), (2, 1, "b"), (3, 1, "a"), (4, 1, "b"),
      (5, 2, "a"), (6, 2, "b"))
    val scale = 1000000000000L
    var pa = scale / 2
    var pb = scale / 2
    (1 to 12).foreach { _ =>
      val na = pb // unit_b = pb div 1, times cnt 1
      val nb = (pa / 3) * 3
      pa = na; pb = nb
    }
    val out = SequenceMining.markovStationary(df, col("user_id"),
      col("event_type"), col("ts"), col("event_id"), iters = 12)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(out("a") == pa && out("b") == pb)
    assert(math.abs(out("a") - out("b")) <= 10L) // near-uniform up to dust
  }

  test("markovStationary: dangling type redistributes uniformly and mass " +
    "is conserved up to integer-division dust") {
    // a -> z, z has no outgoing: z's mass teleports uniformly each round
    val df = ev((1, 1, "a"), (2, 1, "z"), (3, 2, "a"), (4, 2, "z"))
    val out = SequenceMining.markovStationary(df, col("user_id"),
      col("event_type"), col("ts"), col("event_id"), iters = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val total = out.map(_._3).sum
    val scale = 1000000000000L
    assert(total <= scale && total > scale - 1000L, s"mass $total")
    assert(out.find(_._1 == "z").get._2 == 0L) // dangling
    // determinism across partitionings
    val again = SequenceMining.markovStationary(df.repartition(7),
      col("user_id"), col("event_type"), col("ts"), col("event_id"), iters = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq.sorted == again.toSeq.sorted)
  }

  test("markovStationary guards: empty chain and type explosion fail loudly") {
    val one = ev((1, 1, "a"))
    assertThrows[IllegalArgumentException] {
      SequenceMining.markovStationary(one, col("user_id"), col("event_type"),
        col("ts"), col("event_id"))
    }
    val many = ev((1L to 80L).map(i => (i, 1L, s"t$i")): _*)
    assertThrows[IllegalArgumentException] {
      SequenceMining.markovStationary(many, col("user_id"), col("event_type"),
        col("ts"), col("event_id"), maxTypes = 64)
    }
  }

  test("nextEventBaseline: argmax successor with smallest-type tie") {
    // from a: b twice, c twice (tie -> b); from b: a once
    val df = ev((1, 1, "a"), (2, 1, "b"), (3, 1, "a"), (4, 1, "c"),
      (5, 2, "a"), (6, 2, "b"), (7, 2, "a"), (8, 2, "c"))
    val out = SequenceMining.nextEventBaseline(df, col("user_id"),
      col("event_type"), col("ts"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList
    val a = out.find(_._1 == "a").get
    assert(a._2 == "b" && a._3 == 4L && a._4 == 2L && a._5 == 500000L)
    val b = out.find(_._1 == "b").get
    assert(b._2 == "a" && b._5 == 1000000L)
  }

  test("sessionEntropy: uniform two-type user gets ln 2, single-type gets 0") {
    val df = ev((1, 1, "a"), (2, 1, "b"), (3, 1, "a"), (4, 1, "b"),
      (5, 2, "a"), (6, 2, "a"))
    val out = SequenceMining.sessionEntropy(df, col("user_id"),
      col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.find(_._1 == 1L).get._4 == math.rint(math.log(2.0) * 1e6) / 1e6)
    assert(out.find(_._1 == 2L).get == ((2L, 2L, 1L, -0.0d)) ||
      out.find(_._1 == 2L).get == ((2L, 2L, 1L, 0.0d)))
  }
}
