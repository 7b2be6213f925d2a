package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

import graft.SparkSpec

/** Vocabulary.phraseSearch — exact positional phrase matching. */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("two-term phrase: adjacency in order, ranked by match count") {
    val df = docs(
      1L -> "big table scan and another table scan here",
      2L -> "table scan once",
      3L -> "scan table reversed never matches",
      4L -> "table alone and scan apart")
    val out = Vocabulary.phraseSearch(df, "text", "doc_id",
      Seq("table", "scan"), k = 10)
      .select("doc", "n_matches", "rank").collect()
    assert(out.toSeq == Seq(Row(1L, 2L, 1L), Row(2L, 1L, 2L)))
  }

  test("three-term phrase with overlapping occurrences counts every start") {
    // "a a a a" contains "a a a" at starts 0 and 1
    val df = docs(5L -> "a a a a", 6L -> "a a b a a a")
    val out = Vocabulary.phraseSearch(df, "text", "doc_id",
      Seq("a", "a", "a"), k = 10)
      .select("doc", "n_matches", "rank").collect()
    assert(out.toSeq == Seq(Row(5L, 2L, 1L), Row(6L, 1L, 2L)))
  }

  test("case-insensitive on both phrase and corpus; ties rank by doc id") {
    val df = docs(9L -> "Foo BAR", 8L -> "foo bar")
    val out = Vocabulary.phraseSearch(df, "text", "doc_id",
      Seq("FOO", "Bar"), k = 10)
      .select("doc", "n_matches", "rank").collect()
    assert(out.toSeq == Seq(Row(8L, 1L, 1L), Row(9L, 1L, 2L)))
  }

  test("no matches / empty input → empty result, not an error") {
    assert(Vocabulary.phraseSearch(docs(1L -> "x y z"), "text", "doc_id",
      Seq("never", "there"), k = 5).isEmpty)
    assert(Vocabulary.phraseSearch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", "doc_id",
      Seq("a", "b"), k = 5).isEmpty)
  }

  test("plan: postings prune to phrase terms at the scan; no nested-loop join; top-k not a global sort") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = Vocabulary.phraseSearch(real, "text", "doc_id", Seq("table", "scan"), k = 20)
    q.collect()
    val plan = q.queryExecution.executedPlan
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => s +: flatten(s.plan)
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w +: flatten(w.child)
      case other => other +: other.children.flatMap(flatten)
    }
    val nodes = flatten(plan)
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "adjacency must stay an equi-join")
    assert(nodes.exists(_.nodeName.contains("TakeOrderedAndProject")),
      s"top-k must be distributed, not a global sort:\n$plan")
    // the IN filter sits on the generated postings (term isin ...)
    assert(plan.toString.contains("INSET") || plan.toString.contains(" IN ("),
      "phrase-term pruning filter missing from the plan")
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    assert(scans.forall(_.requiredSchema.fieldNames.toSet == Set("doc_id", "text")),
      "scan must read only (doc_id, text)")
  }

  // --- moreLikeThis ---------------------------------------------------------

  test("moreLikeThis: query doc's distinctive terms retrieve its neighbors, self excluded") {
    // doc 1's distinctive vocabulary is (zebra, quagga): common filler
    // words carry ln(N/df)=0 idf, so the tf-idf selection must pick the
    // rare terms and rank doc 2 (both rare terms) above doc 3 (one)
    val df = docs(
      1L -> "the the zebra quagga the",
      2L -> "the zebra quagga runs",
      3L -> "the zebra alone here",
      4L -> "the common words only")
    val out = Vocabulary.moreLikeThis(df, "text", "doc_id",
      queryDocId = 1L, nTerms = 2, k = 10)
      .select("doc", "rank").collect()
    assert(!out.exists(_.getLong(0) == 1L), "query doc must be excluded")
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 3L),
      s"expected neighbors (2 then 3), got ${out.toSeq}")
  }

  test("moreLikeThis: unknown doc id or a doc sharing no terms → empty, not an error") {
    val df = docs(1L -> "alpha beta", 2L -> "gamma delta")
    assert(Vocabulary.moreLikeThis(df, "text", "doc_id", 99L).isEmpty)
    assert(Vocabulary.moreLikeThis(df, "text", "doc_id", 1L).isEmpty)
  }
}
