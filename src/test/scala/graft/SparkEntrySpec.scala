package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract guards for the driver interface: every query has a stable name,
  * every oracle belongs to a real query, and the oracle set matches the
  * declared rows-only exceptions — catches a renamed query whose oracle
  * silently stops being compared. */
class SparkEntrySpec extends AnyFunSuite {

  test("oracleSql keys are exactly the sql-checked queries") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(queries),
      s"oracles without a query: ${oracles -- queries}")
    val rowsOnly = queries -- oracles
    // the genuinely non-replayable ops — growing this set needs a reason;
    // simhash (x08) IS replayable via the HUGEINT FNV/fmix64 oracle. The
    // three ANN paths have recall<1 by design (accuracy pinned by
    // RecallSpec); x36's HLL++ sketch differs from DuckDB's HLL
    // implementation (error envelope pinned by ApproxDistinctSpec); x40's
    // iterative argmax loop has no single-statement SQL form (merge
    // sequence pinned by BpeTrainerSpec's reference cross-check).
    assert(rowsOnly == Set("x14_cosine_lsh_topk",
      "x15_embedding_neardup", "x16_cosine_ivf_topk", "x36_approx_distinct",
      "x40_bpe_merges", "x41_bpe_tokenize", "x42_semantic_dedup"),
      s"unexpected rows-only set: $rowsOnly")
  }

  test("query names follow the pack naming scheme") {
    val pat = "^[a-z]\\d{2}_[a-z0-9_]+$".r
    SparkEntry.queries.keys.foreach { k =>
      assert(pat.matches(k), s"bad query name: $k")
    }
  }

  test("every oracle carries a total ORDER BY (deterministic compare)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.toUpperCase.contains("ORDER BY") || sql.trim.startsWith("WITH f AS") ||
        name == "x17_training_pipeline" || name == "d14_retention_counts",
        s"$name oracle has no ORDER BY")
    }
  }
}
