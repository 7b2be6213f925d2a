package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Quantitative recall bounds for the approximate similarity paths
  * (x14 lshTopK, x15 cosineNearDuplicates, x16 ivfTopK) against the exact
  * baselines, at the SAME parameters the SparkEntry queries use and on the
  * same sf0.01 embeddings the driver verifies with. These pin the
  * accuracy/cost trade the ANN paths make: the driver gate checks them
  * rows-only (recall < 1 by design), so this spec is their correctness
  * contract — a kernel or banding regression shows up as a recall drop.
  *
  * Bounds are measured-then-pinned (measured values in each test); they are
  * regression floors a few points under the measured recall, not averages.
  */
class RecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private lazy val emb = Tables.embeddings(spark, dir).cache()
  private lazy val queries = emb.orderBy("vec_id").limit(20)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  /** Exact top-5 per query — the ground truth for both ANN paths. */
  private lazy val exactTop5: Map[(Long, Long), Double] =
    Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
      "qid", "qvec", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  private def collectTopK(df: org.apache.spark.sql.DataFrame): Array[(Long, Long, Double)] =
    df.select(col("qid"), col("vec_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  private def recallAt5(approx: Array[(Long, Long, Double)]): Double =
    approx.count { case (q, id, _) => exactTop5.contains((q, id)) }.toDouble /
      exactTop5.size

  test("x14 lshTopK: recall@5 >= 0.90 at nBits=8/probe=2/8 tables, sims exact") {
    val approx = collectTopK(Similarity.lshTopK(emb, queries,
      "vec_id", "embedding", "qid", "qvec",
      k = 5, nBits = 8, probeHamming = 2, dim = 64, nTables = 8))
    val recall = recallAt5(approx)
    info(f"lsh recall@5 = $recall%.3f (${approx.length} rows)")
    assert(recall >= 0.90, f"lsh recall@5 $recall%.3f below pinned 0.90")
    // every reported sim is the EXACT cosine: for pairs the exact baseline
    // also ranked, the values must agree bit-for-bit (same kernel, same
    // arithmetic order)
    approx.foreach { case (q, id, sim) =>
      exactTop5.get((q, id)).foreach { exact =>
        assert(java.lang.Double.doubleToLongBits(sim) ==
          java.lang.Double.doubleToLongBits(exact), s"sim drift for ($q,$id)")
      }
    }
  }

  test("x14 shipped setting (probe=3) reaches FULL recall on the gate corpus") {
    // the x14 entry ships nBits=8/probe=3/8 tables precisely because the
    // measured recall@5 is 1.0 on this corpus family (sf0.001–0.1) — which
    // is what lets the driver hash-check it against the exact-top-k oracle
    // (the x07 banding pattern). A recall drop here = the oracle gate
    // breaks; this spec makes the failure local and named.
    val approx = collectTopK(Similarity.lshTopK(emb, queries,
      "vec_id", "embedding", "qid", "qvec",
      k = 5, nBits = 8, probeHamming = 3, dim = 64, nTables = 8))
    val recall = recallAt5(approx)
    info(f"lsh recall@5 (shipped probe=3) = $recall%.3f")
    assert(recall == 1.0, f"shipped x14 setting no longer exact: $recall%.3f")
  }

  test("ivfTopKPivots: deterministic, sims exact, replays the pivot contract") {
    val a = Similarity.ivfTopKPivots(emb.repartition(1), queries,
      "vec_id", "embedding", "qid", "qvec", k = 5, nCells = 16, nProbe = 4)
      .orderBy("qid", "rank").collect().map(_.toString).toSeq
    val b = Similarity.ivfTopKPivots(emb.repartition(13), queries,
      "vec_id", "embedding", "qid", "qvec", k = 5, nCells = 16, nProbe = 4)
      .orderBy("qid", "rank").collect().map(_.toString).toSeq
    assert(a == b, "pivot IVF must be independent of partition layout")

    val approx = collectTopK(Similarity.ivfTopKPivots(emb, queries,
      "vec_id", "embedding", "qid", "qvec", k = 5, nCells = 16, nProbe = 4))
    // reported sims are exact cosines wherever the exact baseline ranked
    // the same pair
    approx.foreach { case (q, id, sim) =>
      exactTop5.get((q, id)).foreach { exact =>
        assert(java.lang.Double.doubleToLongBits(sim) ==
          java.lang.Double.doubleToLongBits(exact), s"sim drift for ($q,$id)")
      }
    }
    val recall = recallAt5(approx)
    info(f"pivot ivf recall@5 = $recall%.3f")
    assert(recall >= 0.40, f"pivot ivf recall $recall%.3f below pinned 0.40")
  }

  test("spherical lloyd: unit centroids, cosine-consistent assignment") {
    val rnd = new scala.util.Random(3)
    val pts = Array.fill(400)(Array.fill(8)(rnd.nextGaussian()))
    val cents = Similarity.lloyd(pts, k = 6, maxIter = 5, seed = 11L,
      spherical = true)
    cents.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-12, s"centroid norm $n not unit")
    }
    // for unit centroids, argmin-L2 == argmax-cosine for ANY raw vector
    pts.take(50).foreach { p =>
      val byL2 = cents.indices.minBy(i =>
        p.zip(cents(i)).map { case (x, c) => (x - c) * (x - c) }.sum)
      val byCos = cents.indices.maxBy(i =>
        p.zip(cents(i)).map { case (x, c) => x * c }.sum /
          math.sqrt(p.map(x => x * x).sum))
      assert(byL2 == byCos)
    }
  }

  test("x16 ivfTopK: pinned recall floor at shipped params, recall/cost dial works") {
    // this corpus has genuinely diffuse clusters (true top-5 sims median
    // 0.32), so a query's neighbors straddle cells: recall at the shipped
    // nProbe=4/16 (25% of cells) is ~0.57 — pinned as a floor, not a target.
    // The IVF contract is the DIAL: more probes buy recall smoothly.
    val approx4 = collectTopK(Similarity.ivfTopK(emb, queries,
      "vec_id", "embedding", "qid", "qvec",
      k = 5, nCentroids = 16, nProbe = 4))
    val recall4 = recallAt5(approx4)
    info(f"ivf recall@5 nProbe=4 = $recall4%.3f")
    assert(recall4 >= 0.50, f"ivf recall@5 $recall4%.3f below pinned 0.50")
    approx4.foreach { case (q, id, sim) =>
      exactTop5.get((q, id)).foreach { exact =>
        assert(java.lang.Double.doubleToLongBits(sim) ==
          java.lang.Double.doubleToLongBits(exact), s"sim drift for ($q,$id)")
      }
    }
    val recall8 = recallAt5(collectTopK(Similarity.ivfTopK(emb, queries,
      "vec_id", "embedding", "qid", "qvec",
      k = 5, nCentroids = 16, nProbe = 8)))
    info(f"ivf recall@5 nProbe=8 = $recall8%.3f")
    assert(recall8 >= recall4, "more probes must not lose recall")
    assert(recall8 >= 0.75, f"ivf recall@5 at nProbe=8 $recall8%.3f below pinned 0.75")
  }

  /** Exact all-pairs ground truth at sim >= threshold (500 vectors →
    * 125k candidate pairs, one codegen'd pass). */
  private def truePairs(threshold: Double): Set[(Long, Long)] = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("sim", Similarity.cosine(col("va"), col("vb")))
      .where(col("sim") >= threshold)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("cosineNearDuplicates LSH stress case: low-threshold recall holds at small scale") {
    // hyperplane LSH at sim 0.3 is OUTSIDE its design regime (the operator
    // doc directs mid-sim mining to cell blocking; the x15 entry ships that
    // path) — this keeps the low-threshold setting as a measured stress
    // exercise: at ~10³ vectors the saturating 8-bit/6-table construction
    // still clears 0.85 recall with exact-precision verification
    val threshold = 0.3
    val truth = truePairs(threshold)
    val found = Similarity.cosineNearDuplicates(emb, "vec_id", "embedding",
      threshold = threshold, nBits = 8, dim = 64, probeHamming = 2, nTables = 6)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // precision is 1.0 by construction (candidates are verified with the
    // exact cosine) — pin it anyway so a verify-stage regression is loud
    assert(found.subsetOf(truth), s"false positives: ${(found -- truth).take(5)}")
    val recall = if (truth.isEmpty) 1.0 else found.size.toDouble / truth.size
    info(f"lsh neardup recall = $recall%.3f (${found.size}/${truth.size} pairs)")
    assert(recall >= 0.85, f"lsh neardup recall $recall%.3f below pinned 0.85")
  }

  test("x15 cellBlockedPairs: perfect precision, pinned pair recall at the shipped parameters") {
    val threshold = 0.3
    val truth = truePairs(threshold)
    // measured on this fixture: 0.784 at nc=8/4 passes, 0.890 at nc=8/6
    // passes (the shipped setting) — pinned a few points under
    val found = Similarity.cellBlockedPairs(emb, "vec_id", "embedding",
      threshold = threshold, nCentroids = 8, passes = 6)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(found.subsetOf(truth), s"false positives: ${(found -- truth).take(5)}")
    val recall = if (truth.isEmpty) 1.0 else found.size.toDouble / truth.size
    info(f"cell-blocked pair recall = $recall%.3f (${found.size}/${truth.size} pairs)")
    assert(recall >= 0.85, f"cell-blocked pair recall $recall%.3f below pinned 0.85")
  }
}
