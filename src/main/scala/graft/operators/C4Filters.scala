package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning heuristics (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning…", §2.2 — public recipe), as a single shuffle-free
  * projection. C4 is line-oriented where Gopher (QualityRules) is
  * document-statistical: each line survives only if it ends in terminal
  * punctuation and carries enough words; the document survives only if
  * enough lines remain and it contains none of the ban-list phrases or a
  * curly brace (the paper's "looks like code" proxy).
  *
  * Scale shape: every rule is a per-row Column expression over the split
  * line array — no explode, no shuffle, whole-stage-codegen end to end.
  * At 100 TB this runs at scan speed and composes with any downstream
  * pass (the cleaned text column is what the dedup family consumes).
  */
object C4Filters {

  /** Terminal punctuation accepted by the C4 line rule (the paper's
    * "terminal punctuation mark", extended with the closing quote forms). */
  private val TerminalPunct = Seq(".", "!", "?", "\"", "'")

  private def lineKept(ln: Column, minWordsPerLine: Int): Column = {
    val t = trim(ln)
    val endsPunct = TerminalPunct
      .map(p => t.endsWith(p))
      .reduce(_ || _)
    // word count = number of maximal \S runs — identical to the
    // size(filter(split(t, "\s+"), _ =!= "")) it replaces (split tokens
    // ARE the \S+ runs; the filter only dropped a leading-separator
    // artifact). regexp_count plans as ONE size(regexp_extract_all(…))
    // where the old chain was split + a per-element lambda filter —
    // one expression pass instead of three inside a predicate that runs
    // once per LINE of every document (guide §1.2 per-task work)
    val enoughWords =
      regexp_count(t, lit("\\S+")) >= minWordsPerLine
    endsPunct && enoughWords
  }

  /** Per-document C4 report: the input columns plus
    *   clean_text        lines surviving the line rule, re-joined with sep
    *   n_lines_total / n_lines_kept
    *   has_bad_phrase    any ban-list phrase in lower(text)
    *   has_brace         '{' anywhere (code proxy)
    *   keep              n_lines_kept ≥ minKeptLines ∧ ¬bad ∧ ¬brace
    * Callers filter on `keep` for the classic C4 behavior; the flags stay
    * exposed so a pipeline can audit WHY a document fell. */
  def c4Report(
      df: DataFrame,
      textCol: String,
      minWordsPerLine: Int = 5,
      minKeptLines: Int = 3,
      badPhrases: Seq[String] = Seq("lorem ipsum", "javascript must be enabled",
        "terms of use", "privacy policy", "cookie policy"),
      lineSep: String = "\n"): DataFrame = {
    require(minWordsPerLine >= 1 && minKeptLines >= 1,
      "minWordsPerLine and minKeptLines must be ≥ 1")
    Seq("clean_text", "n_lines_total", "n_lines_kept", "has_bad_phrase",
      "has_brace", "keep").foreach(r => require(!df.columns.contains(r),
      s"c4Report appends output column $r which already exists on the input"))
    val lines: Column = split(col(textCol), java.util.regex.Pattern.quote(lineSep))
    val kept: Column = filter(lines, ln => lineKept(ln, minWordsPerLine))
    val lowered = lower(col(textCol))
    val bad: Column =
      if (badPhrases.isEmpty) lit(false)
      else badPhrases.map(p => lowered.contains(p.toLowerCase)).reduce(_ || _)

    df.select(
      df.columns.map(col) ++ Seq[Column](
        concat_ws(lineSep, transform(kept, ln => trim(ln))).as("clean_text"),
        size(lines).cast("long").as("n_lines_total"),
        size(kept).cast("long").as("n_lines_kept"),
        bad.as("has_bad_phrase"),
        col(textCol).contains("{").as("has_brace"),
        (size(kept) >= minKeptLines && !bad &&
          !col(textCol).contains("{")).as("keep")): _*)
  }
}
