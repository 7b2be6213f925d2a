package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LabelQaSpec extends SparkSpec {

  import spark.implicits._

  test("confidentLearningJoint: hand-computed thresholds, margins and joint") {
    // given-positive scores: 0.9, 0.8, 0.2  -> t_pos = (9000+8000+2000) div 3 = 6333
    // given-negative scores: 0.1, 0.3       -> t_neg = (9000+7000) div 2 = 8000
    val df = Seq(
      (0.9, true), (0.8, true), (0.2, true), (0.1, false), (0.3, false))
      .toDF("s", "g")
    val out = LabelQa.confidentLearningJoint(df, col("s"), col("g"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r)).toMap
    // row 0.9 g=1: m_pos=2667 ok, m_neg=-7000 -> pred 1 (cell 1,1)
    // row 0.8 g=1: m_pos=1667 ok            -> pred 1 (cell 1,1)
    // row 0.2 g=1: m_pos=-4333, m_neg=0 ok  -> pred 0 (cell 1,0) ERROR candidate
    // row 0.1 g=0: m_neg=1000 ok            -> pred 0 (cell 0,0)
    // row 0.3 g=0: m_pos=-3333, m_neg=-1000 -> unconfident
    assert(out((1, 1)).getLong(2) == 2L)
    assert(out((1, 0)).getLong(2) == 1L)
    assert(out((0, 0)).getLong(2) == 1L)
    assert(!out.contains((0, 1)))
    assert(out((1, 1)).getLong(3) == 6333L && out((1, 1)).getLong(4) == 8000L)
    assert(out((1, 1)).getLong(5) == 1L) // n_unconfident
  }

  test("confidentLearningJoint: double-qualifying rows resolve by margin, " +
    "ties to positive") {
    // t_pos = 0 (all positives at 0.0? no) — construct: positives {0.0},
    // negatives {1.0}: t_pos = 0, t_neg = 0 -> every row double-qualifies
    val df = Seq((0.6, true), (0.4, false), (0.5, true)).toDF("s", "g")
    // t_pos = (6000+5000) div 2 = 5500; t_neg = (10000-4000) div 1 = 6000
    // 0.6: m_pos=500, m_neg=-2000 -> 1 ; 0.4: m_pos=-1500, m_neg=0 -> 0
    // 0.5: m_pos=-500, m_neg=-1000 -> unconfident
    val out = LabelQa.confidentLearningJoint(df, col("s"), col("g"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(out == Map((1, 1) -> 1L, (0, 0) -> 1L))
    // the tie rule itself: margins equal -> positive
    val tie = Seq((0.5, true), (0.5, false)).toDF("s", "g")
    // t_pos = 5000, t_neg = 5000: both rows m_pos = m_neg = 0 -> pred 1
    val t = LabelQa.confidentLearningJoint(tie, col("s"), col("g"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(t == Map((1, 1) -> 1L, (0, 1) -> 1L))
  }

  test("weakLabelModel: agreement weights and a weighted flip") {
    // 9 rows where v1=v2=majority and v3 dissents half the time; then
    // verify weights order and the final vote equals majority when no
    // labeler dominates
    val rows = (1L to 8L).map { i =>
      val v1 = i <= 6
      val v2 = i <= 6
      val v3 = i % 2 == 0
      (i, v1, v2, v3)
    }
    val df = rows.toDF("id", "a", "b", "c")
    val out = LabelQa.weakLabelModel(df, col("id"),
      Seq(col("a"), col("b"), col("c"))).collect()
    // majority = v1 (= v2) everywhere: w1 = w2 = 1e6; v3 agrees on
    // {2,4,6 true; 7 false} = 4/8 -> 500000
    val r1 = out.head
    assert(r1.getLong(7) == 1000000L && r1.getLong(8) == 1000000L &&
      r1.getLong(9) == 500000L)
    // weighted vote can never flip against two perfect labelers
    assert(out.forall(r => r.getBoolean(4) == r.getBoolean(5)))
    assert(out.forall(r => !r.getBoolean(6)))
  }

  test("weakLabelModel: deterministic across partitionings") {
    val rows = (1L to 40L).map(i => (i, i % 3 == 0, i % 5 != 0, i % 2 == 0))
    val a = LabelQa.weakLabelModel(rows.toDF("id", "a", "b", "c"),
      col("id"), Seq(col("a"), col("b"), col("c"))).collect().toSeq
    val b = LabelQa.weakLabelModel(rows.toDF("id", "a", "b", "c").repartition(13),
      col("id"), Seq(col("a"), col("b"), col("c"))).collect().toSeq
    assert(a == b)
  }
}
