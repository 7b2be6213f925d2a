package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** IPS/SNIPS off-policy evaluation (x238's operator) on hand-computable
  * fixtures — every output re-derived by hand integer arithmetic. */
class IpsOffPolicySpec extends SparkSpec {

  import spark.implicits._

  test("ips/snips/ess: exact integers on a two-action log") {
    // a: 3 events, rewards 1+2+3 (sr 6e6); b: 1 event, reward 8 (sr 8e6)
    // N=4, K=2 → w_ppm(a) = 4e6 div 6 = 666666, w_ppm(b) = 2e6
    // srw = 6e6·666666 + 8e6·2e6 = 19,999,996,000,000
    // ips   = srw div 4e6              = 4,999,999  (uniform truth: 5.0)
    // w1    = 3·666666 + 2e6           = 3,999,998
    // snips = srw div w1               = 5,000,001
    // w2    = 3·666666² + 4e12         = 5,333,330,666,668
    // ess   = (w1²·1e6) div (w2·4)     = 749,999    (truth: 3 of 4 = 0.75)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 8.0))
      .toDF("act", "r")
    val row = Evaluation.ipsOffPolicy(df, col("act"), col("r")).collect().head
    assert(row.getLong(0) == 4L && row.getLong(1) == 2L)
    assert(row.getLong(2) == 4999999L)
    assert(row.getLong(3) == 5000001L)
    assert(row.getLong(4) == 749999L)
    assert(row.getLong(5) == 2000000L)
  }

  test("uniform logger: all weights 1e6, ips = snips = plain mean, ess = 1e6") {
    val df = Seq(("a", 2.0), ("a", 4.0), ("b", 6.0), ("b", 0.0))
      .toDF("act", "r")
    val row = Evaluation.ipsOffPolicy(df, col("act"), col("r")).collect().head
    assert(row.getLong(2) == 3000000L && row.getLong(3) == 3000000L)
    assert(row.getLong(4) == 1000000L && row.getLong(5) == 1000000L)
  }

  test("negative rewards and the half-up quantization boundary") {
    // -0.0000006 → floor(-0.6 + 0.5) = -1 micro; -0.0000005 → 0 micro
    val df = Seq(("a", -0.0000006), ("a", -0.0000005)).toDF("act", "r")
    val row = Evaluation.ipsOffPolicy(df, col("act"), col("r")).collect().head
    // single action: w_ppm = 1e6, srw = -1e6, ips = srw div 2e6 = -1 → 0?
    // -1,000,000 div 2,000,000 truncates toward zero = 0
    assert(row.getLong(2) == 0L)
    assert(row.getLong(3) == 0L) // srw div w1 = -1e6 div 2e6 = 0
  }

  test("null actions and rewards are excluded; arrival order irrelevant") {
    val rows = Seq(("a", Some(1.0)), (null, Some(9.0)), ("a", None),
      ("b", Some(2.0)), ("a", Some(3.0)))
    val df = rows.toDF("act", "r")
    val x = Evaluation.ipsOffPolicy(df, col("act"), col("r")).collect().head
    val y = Evaluation.ipsOffPolicy(df.repartition(7), col("act"), col("r"))
      .collect().head
    assert(x == y)
    assert(x.getLong(0) == 3L && x.getLong(1) == 2L)
  }
}
