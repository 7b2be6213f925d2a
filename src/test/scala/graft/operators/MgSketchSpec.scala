package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** graft_mg_topk / Sketches.mgHeavyHitters — the Misra–Gries bounded
  * frequent-items summary. Three regimes: exact (distinct ≤ capacity),
  * adversarial eviction (distinct ≫ capacity, MG undercount bound), and
  * partition independence in the exact regime. */
class MgSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: counts equal the true counts, any partitioning") {
    // 10 distinct terms, skewed counts, capacity 16 > distinct
    val rows = (1 to 10).flatMap(t => Seq.fill(t * 3)(("g", s"t$t")))
    for (parts <- Seq(1, 7)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts)).toDF("grp", "term")
      val got = Sketches.mgHeavyHitters(df, col("term"), "grp",
        capacity = 16, topK = 10)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      val expected = (1 to 10).map(t => (s"t$t", t * 3L))
        .sortBy { case (term, c) => (-c, term) }
        .zipWithIndex.map { case ((term, c), i) => (term, c, i + 1L) }
      assert(got.toSeq == expected, s"parts=$parts")
    }
  }

  test("eviction regime: MG undercount bound est ∈ [true − n/(cap+1), true]") {
    // one heavy term (40% of the stream) among 200 distinct light terms;
    // capacity 8 forces constant eviction
    val n = 5000
    val rows = (1 to n).map { i =>
      if (i % 5 < 2) ("g", "heavy") else ("g", s"light${i % 200}")
    }
    val out = Sketches.mgHeavyHitters(rows.toDF("grp", "term"), col("term"),
      "grp", capacity = 8, topK = 8).collect()
    val heavy = out.find(_.getString(1) == "heavy")
    val trueHeavy = rows.count(_._2 == "heavy").toLong
    // guaranteed present: true count 2000 > n/(cap+1) ≈ 556
    assert(heavy.isDefined, "a 40% term must survive MG with capacity 8")
    val est = heavy.get.getLong(2)
    assert(est <= trueHeavy, "MG never overcounts")
    assert(est >= trueHeavy - n / (8 + 1) - 1,
      s"undercount beyond the n/(cap+1) bound: est=$est true=$trueHeavy")
  }

  test("state stays capacity-bounded: full summary size ≤ capacity") {
    val rows = (1 to 3000).map(i => ("g", s"t${i % 500}"))
    graft.functions.GraftFunctions.register(spark)
    val summary = rows.toDF("grp", "term")
      .groupBy("grp")
      .agg(call_function("graft_mg_topk", col("term"), lit(8)).as("mg"))
      .select(size(col("mg"))).as[Int].collect()(0)
    assert(summary <= 8)
  }

  test("streaming-vs-batch parity holds in the exact regime (shared kernel)") {
    // mgHeavyHitters is the single kernel the streaming leg reuses; pin
    // that two different groupings of the same rows agree exactly
    val rows = (1 to 600).map(i => (s"g${i % 3}", s"t${i % 20}"))
    val a = Sketches.mgHeavyHitters(rows.toDF("grp", "term"), col("term"),
      "grp", capacity = 64, topK = 20).collect().map(_.toString).sorted.toSeq
    val b = Sketches.mgHeavyHitters(
      rows.reverse.toDF("grp", "term"), col("term"),
      "grp", capacity = 64, topK = 20).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
