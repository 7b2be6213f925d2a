package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join preserves exact join semantics") {
    val fact = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("key", "label")

    val plain = fact.join(dim, Seq("key")).select("key", "v", "label")
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8).select("key", "v", "label")
    val a = plain.collect().map(_.toString).sorted.toSeq
    val b = salted.collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("salted two-stage aggregation equals direct aggregation") {
    val df = (1 to 5000).map(i => (if (i % 3 == 0) "hot" else s"k${i % 50}", i.toDouble))
      .toDF("key", "v")
    val direct = df.groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("sum"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val salted = Skew.saltedCountSum(df, "key", "v", salts = 16)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(direct.keySet == salted.keySet)
    direct.foreach { case (k, (n, s)) =>
      val (n2, s2) = salted(k)
      assert(n == n2 && math.abs(s - s2) < 1e-6, k)
    }
  }

  test("skewReport: exact shares, skew factor and salt recommendation") {
    // 100 'hot' + 10×'warm' + 40 singletons = 150 rows, 42 keys
    val df = (Seq.fill(100)("hot") ++ Seq.fill(10)("warm") ++
      (1 to 40).map(i => s"k$i")).toDF("key")
    val rep = Skew.skewReport(df, col("key"), topK = 3, parallelism = 30)
      .collect()
    assert(rep.length == 3)
    val hot = rep.find(_.getAs[String]("key") == "hot").get
    assert(hot.getAs[Long]("rank") == 1L)
    assert(hot.getAs[Long]("cnt") == 100L)
    assert(hot.getAs[Long]("share_ppm") == 100L * 1000000 / 150)
    assert(hot.getAs[Long]("n_rows") == 150L)
    assert(hot.getAs[Long]("n_keys") == 42L)
    // max/avg = 100 / (150/42) = 28x
    assert(hot.getAs[Long]("hot_over_avg_ppm") == 100L * 42 * 1000000 / 150)
    // hot needs ceil(100·30/150) = 20 of the 30 reducers' worth of salt
    assert(hot.getAs[Long]("rec_salts") == 20L)
    val warm = rep.find(_.getAs[String]("key") == "warm").get
    assert(warm.getAs[Long]("rank") == 2L && warm.getAs[Long]("rec_salts") == 2L)
    // rank 3 = the first singleton in key order, salts round up to 1
    assert(rep.find(_.getAs[Long]("rank") == 3L).get.getAs[Long]("rec_salts") == 1L)
  }

  test("salted keep-latest equals the window dedup on a 10:1-skewed fixture, no window task") {
    // hot key carries 10x the rows of every other key — the regime where
    // the row_number window puts one straggler task on the hot key
    val rows =
      (1 to 5000).map(i => ("hot", i.toLong, i * 0.5)) ++
      (1 to 50).flatMap(k => (1 to 500).map(i => (s"k$k", i.toLong, i * 0.25)))
    val df = rows.toDF("key", "seq", "score").repartition(16)

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy(desc("seq"), desc("score"))
    val windowed = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("key", "seq", "score")
      .collect().map(_.toString).sorted.toSeq

    val salted = Skew.saltedKeepLatest(df, "key", Seq("seq", "score"), salts = 8)
    val got = salted.select("key", "seq", "score")
      .collect().map(_.toString).sorted.toSeq
    assert(got == windowed && got.nonEmpty, "salted keep-latest diverged from the window answer")

    // plan shape: no Window operator anywhere, and the partial aggregation
    // keys include the salt — the hot key's rows land on `salts` reducers
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case q: QueryStageExec => q +: flatten(q.plan)
      case o => o +: o.children.flatMap(flatten)
    }
    val nodes = flatten(salted.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[WindowExec]),
      "salted keep-latest must not plan a window")
    val saltedAggs = nodes.collect {
      case a: BaseAggregateExec
        if a.groupingExpressions.exists(_.toString.contains("__salt")) => a
    }
    assert(saltedAggs.nonEmpty,
      "partial phase must group by (key, salt) so the hot key spreads across reducers")
  }

  test("bucketed tables join without a shuffle exchange") {
    val left = (1L to 2000L).map(i => (i, s"l$i")).toDF("id", "lv")
    val right = (1L to 2000L).map(i => (i, s"r$i")).toDF("id", "rv")
    for (t <- Seq("bkt_left", "bkt_right")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a stale location from a previous JVM isn't in this session's
      // in-memory catalog — remove the directory itself
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      val dir = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Skew.writeBucketed(left, "bkt_left", "id", buckets = 8)
    Skew.writeBucketed(right, "bkt_right", "id", buckets = 8)
    // merge hint on the POSITIVE case too: without it Spark broadcasts the
    // 2000-row side, which is also shuffle-free and would vacuously pass —
    // the assertion must hold on the sort-merge path where bucketing is
    // what removes the exchange
    val joined = spark.table("bkt_left")
      .join(spark.table("bkt_right").hint("merge"), Seq("id"))
    assert(joined.count() == 2000L)
    assert(!Skew.hasShuffle(joined), "bucketed equi-join must not shuffle")
    // control: the same sort-merge join on unbucketed data DOES shuffle
    // (merge hint: otherwise Spark broadcasts this small side, which is
    // also shuffle-free and proves nothing)
    val unbucketed = left.join(right.withColumnRenamed("rv", "rv2").hint("merge"), Seq("id"))
    unbucketed.count()
    assert(Skew.hasShuffle(unbucketed))
  }
}
