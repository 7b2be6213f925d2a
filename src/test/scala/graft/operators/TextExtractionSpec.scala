package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The extraction-chain contracts x104 pins cross-engine, unit-level:
  * hostile script content, one-level entity decode, decode-after-strip. */
class TextExtractionSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(TextExtraction.htmlToText(col("h")))
      .head().getString(0)

  test("tags, comments and script/style bodies vanish; text survives") {
    val out = extract(
      "<html><head><style>p {color: red}</style></head>" +
        "<body><h1>Hello</h1><script>if (1 < 2) { var s = \"<p>x</p>\"; }</script>" +
        "<p class=\"a\">world</p><!-- gone --></body></html>")
    assert(out == "Hello world")
  }

  test("entities decode one level only, after tag stripping") {
    // &lt;b&gt; decodes to literal text "<b>" (never re-stripped);
    // &amp;lt; un-escapes exactly one level to "&lt;"
    assert(extract("<p>a &lt;b&gt; c &amp;lt; d &nbsp;&#39;q&#39;</p>") ==
      "a <b> c &lt; d 'q'")
  }

  test("case-insensitive script/style, multiline bodies, whitespace collapse") {
    val out = extract(
      "<SCRIPT>\nmulti\nline\n</SCRIPT>x<STYLE media=\"x\">\nb{}\n</STYLE>\n\n  y\tz  ")
    assert(out == "x y z")
  }
}
