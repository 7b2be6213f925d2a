package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths (driver contract "scale extras"):
  *   - bruteForceTopK: exact cosine top-k — the correctness baseline.
  *     Broadcast the (small) query set, scan the corpus once, rank with a
  *     per-query window. Cost O(|corpus|·|queries|·dim) but embarrassingly
  *     parallel and shuffle-light (only top-k survivors move).
  *   - lshTopK: random-hyperplane LSH — the 100 TB path. Sign-bit sketches
  *     bucket the corpus; only same-bucket (or near-bucket) pairs are
  *     scored. Planes are generated driver-side from a fixed seed and
  *     inlined as literals, so the whole thing stays deterministic and
  *     codegen'd (no MLlib VectorUDT boxing on the hot path).
  */
object Similarity {

  private def shl(x: Column, n: Column): Column = call_function("shiftleft", x, n)
  private def shr(x: Column, n: Column): Column = call_function("shiftright", x, n)

  /** Cosine similarity of two float-array columns, computed in double by the
    * native `graft_cosine` kernel (GraftHashUtil.cosine — one fused loop,
    * codegen'd; the earlier zip_with/aggregate formulation was interpreted
    * and cost ~3k evals/s/core). Summation order matches the interpreted
    * form, so results are bit-identical. Requires GraftFunctions.register. */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Native dot product / L2 norm — use these (norms hoisted to per-row
    * columns) on any path that scores many pairs per row. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def norm(a: Column): Column = call_function("graft_norm", a)

  /** Exact top-k neighbors for each query row.
    *
    * queries: (qid, qvec) — must be small enough to broadcast (the usual
    * ANN-serving shape). corpus: (id, vec). Self-matches excluded when ids
    * collide. Returns (qid, id, sim, rank), rank 1..k by descending sim. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      qidCol: String, qvecCol: String,
      k: Int = 10): DataFrame = {

    // Norms are hoisted: ‖corpus row‖ once per row (not once per pair) and
    // ‖query‖ once per query on the broadcast side. Per pair only the dot
    // survives. dot/(nq·nc) keeps the exact arithmetic of cosine(q, c).
    val scored = corpus
      .withColumn("__nc", norm(col(vecCol)))
      .join(broadcast(queries.withColumn("__nq", norm(col(qvecCol)))),
        col(qidCol) =!= col(idCol))
      .withColumn("sim", dot(col(qvecCol), col(vecCol)) / (col("__nq") * col("__nc")))
    val w = Window.partitionBy(qidCol).orderBy(desc("sim"), col(idCol))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("sim"), col("rank"))
  }

  /** Sign-bit sketch of a vector, packed to a long — native kernel
    * (GraftHyperplaneSketch); planes derive deterministically from the seed
    * inside the kernel, memoized per (nBits, dim, seed). */
  def hyperplaneSketch(vec: Column, nBits: Int, dim: Int, seed: Long): Column =
    call_function("graft_hyperplane_sketch", vec, lit(nBits), lit(dim), lit(seed))

  /** Approximate top-k: bucket corpus and queries by hyperplane sketch,
    * score only pairs whose sketches are within `probeHamming` bits
    * (multi-probe via segment equi-join, same pigeonhole trick as SimHash).
    * Recall tunes with nBits/probeHamming; cost stays near-linear. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      qidCol: String, qvecCol: String,
      k: Int = 10,
      nBits: Int = 16,
      probeHamming: Int = 2,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {

    val cs = corpus.withColumn("sk_c", hyperplaneSketch(col(vecCol), nBits, dim, seed))
    val qs = queries.withColumn("sk_q", hyperplaneSketch(col(qvecCol), nBits, dim, seed))

    val segments = probeHamming + 1
    val segBits = math.max(nBits / segments, 1)
    val cSeg = cs.select(
      col(idCol), col(vecCol), col("sk_c"),
      posexplode(transform(sequence(lit(0), lit(segments - 1)),
        s => shr(col("sk_c"), s * segBits).bitwiseAND(lit((1L << segBits) - 1)))))
      .withColumnsRenamed(Map("pos" -> "seg", "col" -> "seg_val"))
    val qSeg = qs.select(
      col(qidCol), col(qvecCol), col("sk_q"),
      posexplode(transform(sequence(lit(0), lit(segments - 1)),
        s => shr(col("sk_q"), s * segBits).bitwiseAND(lit((1L << segBits) - 1)))))
      .withColumnsRenamed(Map("pos" -> "seg", "col" -> "seg_val"))

    val candidates = cSeg.join(broadcast(qSeg), Seq("seg", "seg_val"))
      .where(col(qidCol) =!= col(idCol))
      .where(bit_count(col("sk_c").bitwiseXOR(col("sk_q"))) <= probeHamming)
      .dropDuplicates(qidCol, idCol)

    val w = Window.partitionBy(qidCol).orderBy(desc("sim"), col(idCol))
    candidates
      .withColumn("sim", cosine(col(qvecCol), col(vecCol)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("sim"), col("rank"))
  }

  /** IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    * partitions the corpus into nCentroids cells; each query probes its
    * nProbe nearest cells and scores only those vectors.
    *
    * The scale shape: corpus cell assignment is one MLlib KMeans transform
    * (itself distributed); per-query probing is a broadcast join against the
    * tiny centroid table; candidate scoring touches ~nProbe/nCentroids of
    * the corpus. Deterministic via the KMeans seed. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String,
      qidCol: String, qvecCol: String,
      k: Int = 10,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {

    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val toVec = (c: Column) => array_to_vector(transform(c, x => x.cast("double")))
    // cache: KMeans.fit passes over the features once per iteration — without
    // this the array->vector conversion re-runs maxIter times
    val corpusVec = corpus.withColumn("__features", toVec(col(vecCol))).persist()
    // random init: k-means|| costs ~2 extra distributed passes for init
    // quality an IVF coarse quantizer doesn't need — cells only have to
    // partition the space roughly evenly, and nProbe covers boundary error
    val model = new KMeans()
      .setK(nCentroids).setSeed(seed).setMaxIter(5).setInitMode("random")
      .setFeaturesCol("__features")
      .fit(corpusVec)
    val assigned = model.transform(corpusVec)
      .withColumnRenamed("prediction", "cell").drop("__features")
    // fit is the multi-pass consumer; release the cache now and let the single
    // serving-side transform recompute once rather than leak the cached table
    corpusVec.unpersist(blocking = false)

    // tiny centroid table → broadcast; probe = nProbe closest cells per query
    val centroids = model.clusterCenters.zipWithIndex.toSeq.map { case (v, i) =>
      (i, v.toArray.toSeq)
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroidDf = centroids.toDF("cell", "centroid")
    val l2 = (a: Column, b: Column) => call_function("graft_l2sq", a, b)
    val wProbe = Window.partitionBy(qidCol).orderBy(col("dist"), col("cell"))
    val probes = queries.crossJoin(broadcast(centroidDf))
      .withColumn("dist", l2(col(qvecCol), col("centroid")))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= nProbe)
      .select(col(qidCol), col(qvecCol), col("cell"))

    val w = Window.partitionBy(qidCol).orderBy(desc("sim"), col(idCol))
    assigned.join(broadcast(probes), Seq("cell"))
      .where(col(qidCol) =!= col(idCol))
      .withColumn("sim", cosine(col(qvecCol), col(vecCol)))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (exact, all-pairs within LSH
    * buckets): the dedup-flavored entry point over embeddings. */
  def cosineNearDuplicates(
      df: DataFrame,
      idCol: String, vecCol: String,
      threshold: Double = 0.95,
      nBits: Int = 16,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {

    val sk = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", hyperplaneSketch(col("vec"), nBits, dim, seed))
    val a = sk.select(col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = sk.select(col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .where(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
