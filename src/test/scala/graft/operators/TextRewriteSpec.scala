package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ParagraphDedup (keep-first paragraph dedup) and C4Filters (line/document
  * cleaning rules) — the two document-REWRITING passes added in round 7. */
class TextRewriteSpec extends SparkSpec {
  import spark.implicits._

  // --- ParagraphDedup -------------------------------------------------------

  private def paras(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("keepFirstParagraphs keeps the first (doc, pos) occurrence only") {
    val df = paras(
      1L -> "alpha beta\n\nshared para\n\ngamma",
      2L -> "shared para\n\ndelta",
      3L -> "shared para\n\nshared para")
    val out = ParagraphDedup.keepFirstParagraphs(df, "text", "doc_id")
      .orderBy("doc_id")
      .select("doc_id", "cleaned_text", "n_paras_kept", "n_paras_dropped")
      .collect()
    assert(out(0) === Row(1L, "alpha beta\n\nshared para\n\ngamma", 3L, 0L))
    // doc 2 loses "shared para" (first seen at doc 1 pos 1), keeps delta
    assert(out(1) === Row(2L, "delta", 1L, 1L))
    // doc 3 loses both copies
    assert(out(2) === Row(3L, "", 0L, 2L))
  }

  test("keepFirstParagraphs dedups repeats WITHIN one document too") {
    val df = paras(7L -> "x y\n\nx y\n\nz")
    val out = ParagraphDedup.keepFirstParagraphs(df, "text", "doc_id").collect()(0)
    assert(out.getAs[String]("cleaned_text") === "x y\n\nz")
    assert(out.getAs[Long]("n_paras_dropped") === 1L)
  }

  test("keepFirstParagraphs matches paragraphs after trim") {
    val df = paras(1L -> "  padded  \n\nother", 2L -> "padded")
    val out = ParagraphDedup.keepFirstParagraphs(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("cleaned_text") === "padded\n\nother")
    assert(out(1).getAs[Long]("n_paras_dropped") === 1L)
  }

  test("keepFirstParagraphs: empty input → empty output with the contract schema") {
    val out = ParagraphDedup.keepFirstParagraphs(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", "doc_id")
    assert(out.isEmpty)
    assert(out.columns.toSeq ===
      Seq("doc_id", "text", "cleaned_text", "n_paras_kept", "n_paras_dropped"))
  }

  test("keepFirstParagraphs plan: only id/hash rows shuffle before the doc-keyed join") {
    // The text column must appear in no Exchange other than the final
    // doc_id-keyed join + any pre-existing scan partitioning: assert the
    // hash-keyed aggregation subtree projects only (doc_id, __pos, __ph).
    val df = paras(1L -> "a\n\nb", 2L -> "b\n\nc")
    val plan = ParagraphDedup.keepFirstParagraphs(df, "text", "doc_id")
      .queryExecution.optimizedPlan.toString
    // the winners aggregate sees only the 24-byte projection, never `text`
    val aggLines = plan.linesIterator.filter(_.contains("Aggregate")).toSeq
    assert(aggLines.nonEmpty)
    assert(!aggLines.exists(_.contains("text#")),
      s"paragraph text leaked into the argmin aggregate:\n$plan")
  }

  // --- C4Filters ------------------------------------------------------------

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("c4Report line rule: terminal punctuation AND enough words") {
    val df = docs(1L ->
      "one two three four five.\nshort.\nno terminal punct here at all\nsix seven eight nine ten!")
    val r = C4Filters.c4Report(df, "text", minWordsPerLine = 5, minKeptLines = 1)
      .collect()(0)
    assert(r.getAs[String]("clean_text") ===
      "one two three four five.\nsix seven eight nine ten!")
    assert(r.getAs[Long]("n_lines_total") === 4L)
    assert(r.getAs[Long]("n_lines_kept") === 2L)
    assert(r.getAs[Boolean]("keep"))
  }

  test("c4Report document rules: ban phrase, brace, min kept lines") {
    val df = docs(
      1L -> "a b c d e.\nf g h i j.\nk l m n o.",
      2L -> "a b c d e.\nf g h i j.\nk l m n o.\nsee our privacy policy",
      3L -> "a b c d e.\nvar x = { y: 1 }.\nk l m n o.\np q r s t.",
      4L -> "a b c d e.\nf g h i j.")
    val r = C4Filters.c4Report(df, "text").orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("keep"))
    assert(r(1).getAs[Boolean]("has_bad_phrase") && !r(1).getAs[Boolean]("keep"))
    assert(r(2).getAs[Boolean]("has_brace") && !r(2).getAs[Boolean]("keep"))
    assert(!r(3).getAs[Boolean]("keep")) // only 2 kept lines < 3
  }

  test("c4Report is shuffle-free (pure projection)") {
    val df = docs(1L -> "a b c d e.")
    val physical = C4Filters.c4Report(df, "text")
      .queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"C4 report should be a pure projection:\n$physical")
  }

  test("c4Report: empty input keeps the contract schema") {
    val out = C4Filters.c4Report(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text")
    assert(out.isEmpty)
    assert(out.columns.toSeq === Seq("doc_id", "text", "clean_text",
      "n_lines_total", "n_lines_kept", "has_bad_phrase", "has_brace", "keep"))
  }
}
