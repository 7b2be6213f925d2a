package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** referentialAudit contracts: both anti-join directions on a
  * hand-checkable pair of tables, the NULL-key-is-an-orphan rule, exact
  * ppm rates, and the unique-name guard. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  test("orphans, childless parents, and ppm rates on a hand case") {
    // parents {1,2,3,4}; children reference 1,1,2,9(orphan),null(orphan)
    // → 2/5 orphans = 400000 ppm; parents 3,4 childless → 2/4 = 500000
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), None).toDF("ck")
    val r = DataQuality.referentialAudit(Seq(
      DataQuality.Rel("c->p", child, col("ck"), parent, col("pk")))).head()
    assert(r.getString(0) == "c->p")
    assert(r.getLong(1) == 5L && r.getLong(2) == 2L && r.getLong(3) == 400000L)
    assert(r.getLong(4) == 4L && r.getLong(5) == 2L && r.getLong(6) == 500000L)
  }

  test("clean relationship reports zeros; empty child yields NULL orphan rate") {
    val parent = Seq(1L, 2L).toDF("pk")
    val clean = Seq(1L, 2L, 2L).toDF("ck")
    val r1 = DataQuality.referentialAudit(Seq(
      DataQuality.Rel("ok", clean, col("ck"), parent, col("pk")))).head()
    assert(r1.getLong(2) == 0L && r1.getLong(3) == 0L && r1.getLong(5) == 0L)
    val empty = Seq.empty[Long].toDF("ck")
    val r2 = DataQuality.referentialAudit(Seq(
      DataQuality.Rel("none", empty, col("ck"), parent, col("pk")))).head()
    assert(r2.getLong(1) == 0L && r2.isNullAt(3), "0/0 orphan rate is NULL")
    assert(r2.getLong(5) == 2L, "every parent is childless under an empty child")
  }

  test("multiple relationships union into one report; names must be unique") {
    val p = Seq(1L).toDF("pk"); val c = Seq(1L, 2L).toDF("ck")
    val out = DataQuality.referentialAudit(Seq(
      DataQuality.Rel("a", c, col("ck"), p, col("pk")),
      DataQuality.Rel("b", p, col("pk"), c, col("ck"))))
      .orderBy("rel").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
    assertThrows[IllegalArgumentException] {
      DataQuality.referentialAudit(Seq(
        DataQuality.Rel("dup", c, col("ck"), p, col("pk")),
        DataQuality.Rel("dup", p, col("pk"), c, col("ck"))))
    }
    assertThrows[IllegalArgumentException] {
      DataQuality.referentialAudit(Seq.empty)
    }
  }

  test("diversityAudit: balanced classes hit k·10⁶ effective, dominance → 1·10⁶") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // balanced: 4 classes × 25 rows → simpson_eff exactly 4e6, top 25%
    // skewed: 97 'a' + 3 others → eff ≈ 10000·10⁶/(97²+3) ≈ 1.062e6
    val df = (1 to 100).map(i =>
      (s"c${i % 4}", if (i <= 97) "a" else s"z$i")).toDF("bal", "skw")
    val out = DataQuality.diversityAudit(df,
      Seq("bal" -> col("bal"), "skw" -> col("skw")))
      .collect().map(r => r.getString(0) -> r).toMap
    val bal = out("bal")
    assert(bal.getAs[Long]("n") == 100 && bal.getAs[Long]("n_distinct") == 4)
    assert(bal.getAs[Long]("top_share_ppm") == 250000L)
    assert(bal.getAs[Long]("simpson_eff_ppm") == 4000000L)
    val skw = out("skw")
    assert(skw.getAs[Long]("n_distinct") == 4)
    assert(skw.getAs[Long]("top_share_ppm") == 970000L)
    assert(skw.getAs[Long]("simpson_eff_ppm") == 10000L * 1000000L / (97L * 97 + 3))
    // nulls drop from the audited column only
    val withNull = df.withColumn("maybe",
      when(col("bal") === "c0", lit(null: String)).otherwise(col("bal")))
    val m = DataQuality.diversityAudit(withNull, Seq("maybe" -> col("maybe")))
      .head()
    assert(m.getAs[Long]("n") == 75 && m.getAs[Long]("n_distinct") == 3)
  }
}
