package graft.operators

import graft.SparkSpec

/** jlProject must materialize exactly the md5-derandomized ±1/√outDim
  * matrix and the ascending-fold projection — and actually deliver the
  * JL property (bounded pairwise-distance distortion) on a fixture. */
class JlSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def signs(seed: String, outDim: Int, dim: Int): Array[Array[Double]] = {
    val inv = 1.0 / math.sqrt(outDim.toDouble)
    Array.tabulate(outDim, dim) { (j, i) =>
      if (md5hex(s"$seed:$j:$i").charAt(0) <= '7') inv else -inv
    }
  }

  /** Deterministic pseudo-gaussian-ish vectors (sum of hash draws). */
  private def vec(id: Long, dim: Int): Array[Float] =
    Array.tabulate(dim) { i =>
      val h = md5hex(s"v:$id:$i").take(8)
      (java.lang.Long.parseLong(h, 16).toDouble / 0xFFFFFFFFL.toDouble - 0.5).toFloat
    }

  test("projection equals the driver reference (matrix + ascending fold + round)") {
    val dim = 12; val outDim = 4
    val rows = (0L until 9L).map(i => (i, vec(i, dim).toSeq)).toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) AS embedding")
    val got = Linalg.jlProject(rows, "embedding", dim, outDim, Seq("vec_id"))
      .collect().map(r => (r.getLong(0), (1 to outDim).map(r.getDouble))).toMap
    val m = signs("jl", outDim, dim)
    val exp = (0L until 9L).map { id =>
      val v = vec(id, dim)
      (id, (0 until outDim).map { j =>
        var s = 0.0; var i = 0
        while (i < dim) { s += v(i).toDouble * m(j)(i); i += 1 }
        BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toSeq)
    }.toMap
    for (id <- exp.keys) {
      got(id).zip(exp(id)).foreach { case (g, e) =>
        assert(math.abs(g - e) <= 1e-4 + 1e-12, s"id $id: $g vs $e")
      }
    }
  }

  test("pairwise distances survive within a JL distortion envelope") {
    val dim = 64; val outDim = 16; val n = 40
    val rows = (0L until n.toLong).map(i => (i, vec(i, dim).toSeq))
      .toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) AS embedding")
    val proj = Linalg.jlProject(rows, "embedding", dim, outDim, Seq("vec_id"))
      .collect().map(r => (r.getLong(0), (1 to outDim).map(r.getDouble).toArray)).toMap
    val orig = (0L until n.toLong).map(i => (i, vec(i, dim).map(_.toDouble))).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map(p => (p._1 - p._2) * (p._1 - p._2)).sum
    val ratios = for {
      a <- 0L until n.toLong; b <- (a + 1) until n.toLong
    } yield d2(proj(a), proj(b)) / d2(orig(a), orig(b))
    assert(ratios.forall(r => r > 0.25 && r < 2.5),
      s"distortion out of envelope: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2,
      s"mean distortion should hug 1 (unbiased projection), got $mean")
  }

  test("seed changes the matrix; bounds are enforced") {
    assert(signs("jl", 4, 12).flatten.toSeq != signs("jl2", 4, 12).flatten.toSeq)
    val df = Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Linalg.jlProject(df, "embedding", dim = 2, outDim = 3, carry = Seq("vec_id"))
    }
    intercept[IllegalArgumentException] {
      Linalg.jlProject(df, "embedding", dim = 2, outDim = 0, carry = Seq("vec_id"))
    }
  }
}
