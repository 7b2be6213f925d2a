package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** dpNoisyCounts must apply the exact derandomized Laplace mechanism
  * (md5 60-bit uniform → inverse CDF, scale 1/ε), and clusterCap must
  * keep exactly the md5-draw-smallest `cap` members per cluster with
  * noise passing uncapped. */
class DpCapSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("dp noise equals the inverse-CDF reference; same seed reproduces") {
    val rows = Seq.tabulate(300)(i => (s"src${i % 7}", i))
    val df = rows.toDF("source", "i")
    val got = TextAnalysis.dpNoisyCounts(df, col("source"), epsilon = 0.5)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val exp = rows.groupBy(_._1).map { case (g, v) =>
      val u = java.lang.Long.parseLong(md5hex(s"dp:$g").take(15), 16).toDouble /
        1152921504606846976.0
      val c = u - 0.5
      val noise = (-1.0 / 0.5) * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
      val noisy = BigDecimal(v.size + noise)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      g -> ((v.size.toLong, noisy))
    }
    for ((g, (n, noisy)) <- exp) {
      assert(got(g)._1 == n)
      assert(math.abs(got(g)._2 - noisy) < 1e-9, s"$g: ${got(g)._2} vs $noisy")
    }
    // both noise signs occur across groups (the mechanism isn't one-sided)
    val signs = exp.map { case (_, (n, noisy)) => math.signum(noisy - n) }.toSet
    assert(signs == Set(1.0, -1.0))
    val again = TextAnalysis.dpNoisyCounts(df, col("source"), epsilon = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(again == got.map { case (g, (_, v)) => g -> v })
    // a different seed yields a different release
    val other = TextAnalysis.dpNoisyCounts(df, col("source"), epsilon = 0.5,
      seed = "dp2").collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(other != again)
    intercept[IllegalArgumentException] {
      TextAnalysis.dpNoisyCounts(df, col("source"), epsilon = 0.0)
    }
  }

  test("clusterCap keeps the md5-smallest cap per cluster, noise uncapped") {
    val rows: Seq[(Long, Long)] =
      (0L until 30L).map(i => (i, i % 3)) ++ // clusters 0,1,2 with 10 each
        (100L until 120L).map(i => (i, -1L)) // noise
    val df = rows.toDF("id", "cluster")
    val got = Clustering.clusterCap(df, "id", "cluster", cap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byCluster = rows.filter(_._2 >= 0).groupBy(_._2)
    val expKept = byCluster.flatMap { case (_, members) =>
      members.map(_._1).sortBy(id => (md5hex(s"cc:$id"), id)).take(4)
    }.toSet ++ rows.filter(_._2 == -1L).map(_._1)
    assert(got.filter(_._3).map(_._1).toSet == expKept)
    assert(got.length == rows.length, "clusterCap must never drop rows")
    // all noise kept
    assert(got.filter(_._2 == -1L).forall(_._3))
    intercept[IllegalArgumentException] {
      Clustering.clusterCap(df, "id", "cluster", cap = 0)
    }
  }
}
