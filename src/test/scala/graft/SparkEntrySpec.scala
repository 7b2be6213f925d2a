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
    // round 7 shrank it to two: x15's hyperplane-LSH pair mining keeps
    // recall<1 at parameters no oracle can replay (accuracy pinned by
    // RecallSpec), and x36's HLL++ sketch differs from DuckDB's HLL
    // implementation (error envelope pinned by ApproxDistinctSpec).
    // Everything else that used to sit here is now hash-checked: x14 runs
    // at a full-recall setting against the exact-top-k oracle, x16/x42
    // replay their deterministic pivot quantizer end-to-end, x40/x41
    // replay the whole BPE merge loop as unrolled CTEs.
    assert(rowsOnly == Set("x15_embedding_neardup", "x36_approx_distinct"),
      s"unexpected rows-only set: $rowsOnly")
  }

  test("query names follow the pack naming scheme") {
    val pat = "^[a-z]\\d{2,3}_[a-z0-9_]+$".r
    SparkEntry.queries.keys.foreach { k =>
      assert(pat.matches(k), s"bad query name: $k")
    }
  }

  test("every oracle carries a total ORDER BY (deterministic compare)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // single-row reports (d14, x120) need no ordering to compare
      assert(sql.toUpperCase.contains("ORDER BY") || sql.trim.startsWith("WITH f AS") ||
        name == "x17_training_pipeline" || name == "d14_retention_counts" ||
        name == "x120_agreement_kappa",
        s"$name oracle has no ORDER BY")
    }
  }
}
