package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RadixSelectSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random fixture with duplicates and a wide range
  private def fixture(n: Int) =
    (1 to n).map(i => math.abs((i * 2654435761L) % 1000003L) % 50000L)

  test("radix descent equals the sorted-rank answer on every quantile") {
    val vals = fixture(20000)
    val df = vals.toDF("v").repartition(8)
    val qs = Seq(0L, 1L, 250000L, 500000L, 900000L, 990000L, 1000000L)
    val got = RadixSelect.quantiles(df, col("v"), qs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sorted = vals.sorted
    val n = vals.size.toLong
    qs.foreach { q =>
      val rank = math.max(1L, (q * n + 999999L) / 1000000L)
      val expected = sorted((rank - 1).toInt)
      val row = got.find(_._1 == q).get
      assert(row._2 == rank && row._3 == expected && row._4 == n,
        s"q=$q: got $row expected rank=$rank value=$expected")
    }
  }

  test("heavy duplicates: the rank lands inside the duplicated run") {
    val df = (Seq.fill(5000)(7L) ++ Seq.fill(5000)(1234567L)).toDF("v")
    val got = RadixSelect.quantiles(df, col("v"), Seq(400000L, 600000L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(400000L) == 7L && got(600000L) == 1234567L)
  }

  test("rejects negative values and empty input loudly") {
    intercept[IllegalArgumentException] {
      RadixSelect.quantiles(Seq(-1L, 5L).toDF("v"), col("v"), Seq(500000L))
    }
    intercept[IllegalArgumentException] {
      RadixSelect.quantiles(Seq.empty[Long].toDF("v"), col("v"), Seq(500000L))
    }
  }

  test("winsorized mean: exact cuts, clipped counts, and the robust shift") {
    // 980 values at 100..199 plus 10 tiny and 10 huge outliers
    val vals = (1 to 980).map(i => 100L + (i % 100)) ++
      Seq.fill(10)(1L) ++ Seq.fill(10)(1000000L)
    val df = vals.toDF("v").repartition(6)
    val r = RadixSelect.winsorizedMeanReport(df, col("v"),
      loPpm = 20000L, hiPpm = 980000L).head()
    val sorted = vals.sorted
    val n = vals.size
    val loCut = sorted((math.max(1L, (20000L * n + 999999L) / 1000000L) - 1).toInt)
    val hiCut = sorted((math.max(1L, (980000L * n + 999999L) / 1000000L) - 1).toInt)
    assert(r.getAs[Long]("lo_cut") == loCut && r.getAs[Long]("hi_cut") == hiCut)
    assert(r.getAs[Long]("n_clipped_lo") == vals.count(_ < loCut))
    assert(r.getAs[Long]("n_clipped_hi") == vals.count(_ > hiCut))
    val winso = vals.map(v => math.min(math.max(v, loCut), hiCut)).sum
    assert(r.getAs[Long]("mean_ppm_winsorized") == winso * 1000000L / n)
    // the raw mean is dragged ~10000 up by the huge tail; winsorized is not
    assert(r.getAs[Long]("mean_ppm_raw") - r.getAs[Long]("mean_ppm_winsorized")
      > 1000000L)
  }

  test("the per-round histogram plan has no sort and no window") {
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.SparkPlan
    // the exact shape each descent round executes: filter-to-prefix +
    // byte-bucket hash aggregate — the only exchange carries the ≤ 256×
    // |prefixes| histogram rows, never data rows
    val df = fixture(5000).toDF("v")
      .where(shiftrightunsigned(col("v"), 16).isin(0L))
      .groupBy(shiftrightunsigned(col("v"), 8).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case other => other +: other.children.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[SortExec]), "no sort in a descent round")
    assert(!nodes.exists(_.isInstanceOf[WindowExec]), "no window in a descent round")
  }
}
