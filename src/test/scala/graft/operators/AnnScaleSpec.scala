package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The ANN paths' reason to exist, demonstrated at a scale where it shows:
  * on a 50k-vector clustered corpus (200 clusters, within-cluster sim ~0.9 —
  * the shape of a real embedding corpus, unlike the deliberately-diffuse sf
  * fixtures) both LSH and IVF must beat the brute-force scan on wall time
  * WHILE holding recall@5 ≥ the pinned bounds. Cost here is dominated by the
  * 500-query × 50k-corpus score-everything join (25M scored pairs) that
  * brute force pays and the ANN paths avoid.
  *
  * Deterministic: fixed seeds for centers, jitter, and query draws.
  */
class AnnScaleSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val nClusters = 200
  private val perCluster = 250 // corpus = 50k
  private val nQueries = 500

  private def normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val inv = (1.0 / math.sqrt(s)).toFloat
    v.map(_ * inv)
  }

  private lazy val centers: Array[Array[Float]] = {
    val rnd = new scala.util.Random(0xc0ffee)
    Array.fill(nClusters)(normalize(Array.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  // sigma 0.04 per dim → query↔member cosine ~0.9 (tight, realistic clusters)
  private def jitter(c: Array[Float], seed: Long, sigma: Double): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    normalize(Array.tabulate(dim)(i => (c(i) + sigma * rnd.nextGaussian()).toFloat))
  }

  private lazy val corpus = {
    val rows = (0 until nClusters * perCluster).map { i =>
      (i.toLong, jitter(centers(i % nClusters), 7L * i + 13L, 0.04))
    }
    spark.sparkContext.parallelize(rows, 32).toDF("vec_id", "embedding").cache()
  }

  private lazy val queries = {
    val rows = (0 until nQueries).map { q =>
      (1000000L + q, jitter(centers(q % nClusters), 0x9e3779b9L + q, 0.04))
    }
    spark.sparkContext.parallelize(rows, 4).toDF("qid", "qvec").cache()
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  test("LSH and IVF beat brute force on a 50k clustered corpus at recall@5 >= 0.9") {
    corpus.count(); queries.count() // settle caches outside the timers
    // warm the operator paths on a 500-row slice so JIT doesn't bill the race
    val warmC = corpus.limit(500).cache(); warmC.count()
    Similarity.bruteForceTopK(warmC, queries.limit(5), "vec_id", "embedding",
      "qid", "qvec", k = 5).collect()
    Similarity.lshTopK(warmC, queries.limit(5), "vec_id", "embedding",
      "qid", "qvec", k = 5, nBits = 16, probeHamming = 1, dim = dim, nTables = 8).collect()
    Similarity.ivfTopK(warmC, queries.limit(5), "vec_id", "embedding",
      "qid", "qvec", k = 5, nCentroids = 16, nProbe = 4, fitSampleRows = 400).collect()
    warmC.unpersist()

    val (exact, tExact) = timed(Similarity.bruteForceTopK(
      corpus, queries, "vec_id", "embedding", "qid", "qvec", k = 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)

    val (lsh, tLsh) = timed(Similarity.lshTopK(
      corpus, queries, "vec_id", "embedding", "qid", "qvec",
      k = 5, nBits = 16, probeHamming = 1, dim = dim, nTables = 8)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)

    val (ivf, tIvf) = timed(Similarity.ivfTopK(
      corpus, queries, "vec_id", "embedding", "qid", "qvec",
      k = 5, nCentroids = 128, nProbe = 8, fitSampleRows = 5000)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)

    val lshRecall = (lsh & exact).size.toDouble / exact.size
    val ivfRecall = (ivf & exact).size.toDouble / exact.size
    info(f"brute=$tExact%.2fs lsh=$tLsh%.2fs (recall $lshRecall%.3f) " +
      f"ivf=$tIvf%.2fs (recall $ivfRecall%.3f)")

    assert(lshRecall >= 0.90, f"lsh recall $lshRecall%.3f below 0.90")
    assert(ivfRecall >= 0.90, f"ivf recall $ivfRecall%.3f below 0.90")
    // the whole point: approximate must be cheaper than exact at this scale
    assert(tLsh < tExact, f"lsh $tLsh%.2fs not faster than brute $tExact%.2fs")
    assert(tIvf < tExact, f"ivf $tIvf%.2fs not faster than brute $tExact%.2fs")

    corpus.unpersist(); queries.unpersist()
  }
}
