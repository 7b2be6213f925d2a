package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML-to-text extraction — the stage every web-corpus curation pipeline
  * runs FIRST (the C4/CCNet recipes start from already-extracted WET
  * text; this is the in-engine version of that extraction): drop
  * script/style blocks and comments, strip tags, decode the frequent
  * entities, collapse whitespace. Heuristic by design — a full HTML5
  * tree builder is not a per-row column expression — and deliberately
  * restricted to regex + literal replaces over codegen'd string builtins,
  * so it is a pure projection (no UDF, no shuffle, replayable in any
  * engine with RE2-class regexes: the x104 oracle runs the identical
  * chain in DuckDB).
  *
  * At 100 TB this is the highest-volume operator in the pipeline (it
  * touches every raw byte exactly once), which is why it must stay a
  * narrow whole-stage-codegen projection: no parser state, no Python
  * boundary, nothing per-row on the driver. */
object TextExtraction {

  /** Entities decoded, in decode order: the named set whose literal forms
    * dominate web text. Specific entities decode BEFORE `&amp;` so
    * double-escaped text un-escapes exactly one level ("&amp;lt;" →
    * "&lt;", never "<") — the same observable as a single-pass decoder. */
  private[operators] val entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** The extraction chain. Order matters and is part of the contract:
    * script/style (with content), then comments, then tags, then entity
    * decode (tags produced by decoding stay literal text — they were
    * escaped in the source), then whitespace collapse + trim. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTag = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = entities.foldLeft(noTag) { case (c, (e, r)) =>
      replace(c, lit(e), lit(r))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
