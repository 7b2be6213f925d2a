package graft.queries

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.WholeStageCodegenExec

import graft.SparkSpec

/** Bucketing is the pre-paid shuffle: two tables bucketed the same way on
  * the join key co-locate, and every subsequent join between them skips the
  * exchange entirely — at 100 TB this converts the recurring shuffle of a
  * fact-to-fact join into a one-time write-side cost. This spec proves the
  * contract on real bucketed parquet: the join plan of two 8-bucket tables
  * contains NO shuffle exchange, and the result matches the plain join. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case w: WholeStageCodegenExec => w +: flatten(w.child)
    case other => other +: other.children.flatMap(flatten)
  }

  test("two same-bucketed tables join with zero shuffle exchanges") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val left = (1L to 10000L).map(i => (i % 97, i, i * 2.0)).toDF("k", "id", "v")
    val right = (1L to 5000L).map(i => (i % 97, i, s"r$i")).toDF("k", "rid", "tag")

    spark.sql("DROP TABLE IF EXISTS graft_bucket_left")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_right")
    left.write.mode("overwrite").option("path", s"$tmp/left")
      .bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_left")
    right.write.mode("overwrite").option("path", s"$tmp/right")
      .bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_right")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucket_left")
        .join(spark.table("graft_bucket_right"), "k")
      val n = joined.count()
      joined.collect()
      val shuffles = flatten(joined.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle, saw ${shuffles.size} exchange(s)")

      // correctness: identical to the plain (shuffled) join
      val expected = left.join(right, "k").count()
      assert(n == expected, s"bucketed join rows $n != plain join $expected")
      assert(n > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_left")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_right")
    }
  }
}
