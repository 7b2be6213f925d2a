package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher rule-set semantics on planted documents: each rule violated in
  * isolation by one crafted document, plus one document passing all rules. */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def report(text: String, t: QualityRules.GopherThresholds) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    QualityRules.gopherRules(df, "text", "doc_id", t).collect()(0)
  }

  // Relaxed word-count floor so tiny planted docs can still pass rule 1.
  private val relaxed = QualityRules.GopherThresholds(minWords = 5)

  private val goodText =
    "the quick brown fox jumps over that lazy dog and runs away with some food to have fun"

  test("a clean document passes every rule") {
    val r = report(goodText, relaxed)
    assert(r.getAs[Boolean]("pass"))
    assert(r.getAs[Long]("n_words") === 18)
    assert(r.getAs[Long]("stop_hits") >= 2)
  }

  test("word-count floor fails short documents") {
    val r = report("too short", relaxed)
    assert(!r.getAs[Boolean]("ok_word_count"))
    assert(!r.getAs[Boolean]("pass"))
  }

  test("mean word length out of [3, 10] fails") {
    val low = report("a b c d e f g h i j", relaxed)
    assert(!low.getAs[Boolean]("ok_mean_word_len"))
    val high = report(Seq.fill(6)("pneumonoultramicroscopic").mkString(" "), relaxed)
    assert(!high.getAs[Boolean]("ok_mean_word_len"))
  }

  test("symbol ratio counts '#' and '...' against words") {
    val r = report("the cat # sat ... on # the ... mat # now ... with that", relaxed)
    // 6 symbols / 14 words > 0.1
    assert(!r.getAs[Boolean]("ok_symbol_ratio"))
    assert(r.getAs[Double]("symbol_ratio") > 0.1)
  }

  test("bullet and ellipsis line fractions use line counts") {
    val bullets = (1 to 9).map(i => s"- item $i").mkString("\n") + "\nplain line"
    val rb = report(bullets, relaxed)
    assert(rb.getAs[Double]("bullet_line_ratio") === 0.9)
    assert(rb.getAs[Boolean]("ok_bullet_lines")) // exactly at the threshold
    val rb2 = report((1 to 10).map(i => s"* item $i").mkString("\n"), relaxed)
    assert(!rb2.getAs[Boolean]("ok_bullet_lines"))
    val re = report("first line...\nsecond line...\nthird\nfourth", relaxed)
    assert(re.getAs[Double]("ellipsis_line_ratio") === 0.5)
    assert(!re.getAs[Boolean]("ok_ellipsis_lines"))
  }

  test("alpha-word ratio flags digit/symbol noise") {
    val r = report("the 12 34 56 78 90 11 22 33 44 rows", relaxed)
    assert(!r.getAs[Boolean]("ok_alpha_words"))
  }

  test("stopword rule needs two distinct hits") {
    val r = report("quick brown foxes jump quietly over lazy sleeping dogs today", relaxed)
    assert(r.getAs[Long]("stop_hits") === 0)
    assert(!r.getAs[Boolean]("ok_stopwords"))
  }

  test("empty and null texts survive with zero counts") {
    val df = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "   ")).toDF("doc_id", "text")
    val rows = QualityRules.gopherRules(df, "text", "doc_id").orderBy("doc_id").collect()
    assert(rows.length === 3)
    assert(rows(0).getAs[Long]("n_words") === 0)
    assert(!rows(0).getAs[Boolean]("pass"))
    // null text → null report fields, never a crash
    assert(rows(1).isNullAt(rows(1).fieldIndex("n_words")))
  }

  test("published defaults: the fixture-style short docs fail on word count only") {
    val df = Seq((1L, goodText)).toDF("doc_id", "text")
    val r = QualityRules.gopherRules(df, "text", "doc_id").collect()(0)
    assert(!r.getAs[Boolean]("ok_word_count")) // 18 < 50 default floor
    assert(r.getAs[Boolean]("ok_mean_word_len"))
    assert(r.getAs[Boolean]("ok_alpha_words"))
  }
}
