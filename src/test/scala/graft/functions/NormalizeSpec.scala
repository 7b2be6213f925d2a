package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    GraftTextUtil.normalizeText(UTF8String.fromString(s)).toString

  test("NFC + casefold + whitespace collapse, trimmed") {
    // NFD é (e + combining acute) composes to the NFC single codepoint
    assert(norm("Café  au  LAIT") == "café au lait")
    assert(norm("  A\tB\r\nC ") == "a b c")
    assert(norm("\t \n") == "")
    assert(norm("already normal") == "already normal")
    // vertical tab is in the collapse class (RE2's \s)
    assert(norm("a\u000Bb") == "a b")
  }

  test("simple per-codepoint lowercase matches utf8proc, not the full map") {
    // word-final Greek capital sigma: full case mapping gives 'ς', the
    // simple mapping (and DuckDB's utf8proc lower()) gives 'σ'
    assert(norm("ΣΟΦΟΣ") == "σοφοσ")
    // dotted capital I: full mapping gives "i" + U+0307 combining dot
    // (two codepoints); simple mapping gives plain "i"
    assert(norm("İstanbul") == "istanbul")
    assert(norm("İ").length == 1)
    // non-BMP codepoints survive the per-codepoint walk (no mapping)
    assert(norm("a😀B") == "a😀b")
  }

  test("kernel column equals the driver reference over varied rows") {
    val rows = Seq("Hello  World", "HELLO world", "héllo", "héllo",
      " x ", "", "mIxEd\tCASE\n\nruns")
    val got = rows.toDF("t")
      .select(call_function("graft_normalize", col("t")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got == rows.map(norm))
    // precomposed and combining-mark e-acute normalize identically
    assert(norm("héllo") == norm("héllo"))
  }

  test("null passes through; codegen path stays compiled") {
    val df = Seq(Some("A  b"), None).toDF("t")
      .select(call_function("graft_normalize", col("t")).as("n"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("a b"), None))
    // defineCodeGen means the projection must not fall back to interpreted
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Project") || plan.contains("LocalTableScan"), plan)
  }
}
