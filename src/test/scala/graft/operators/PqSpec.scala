package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Product-quantization contracts (x101/x102): code bounds, the
  * dim-divisibility and maxQueries guards, the empty-query shape, and the
  * ADC/SSE identity — a query scored against ITSELF must see exactly its
  * own reconstruction error (the driver-side LUT arithmetic and the
  * codegen'd l2sq kernel walk the same doubles in the same order). */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir).cache()

  test("pqEncode: 8 codes per vector, all within [0, nCodes)") {
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding",
      nSubspaces = 8, nCodes = 16, seed = "pq1").cache()
    try {
      assert(enc.count() == emb.count())
      val bad = enc.where(
        size(col("codes")) =!= 8 ||
          exists(col("codes"), c => c < 0 || c >= 16)).count()
      assert(bad == 0, "every code must be a valid codebook index")
      assert(enc.where(col("sse") < 0.0).count() == 0, "SSE is a sum of squares")
    } finally enc.unpersist()
  }

  test("pqEncode refuses a dim that does not split into the subspaces") {
    val e = intercept[IllegalArgumentException] {
      Similarity.pqEncode(emb, "vec_id", "embedding",
        nSubspaces = 7, nCodes = 16, seed = "pq1")
    }
    assert(e.getMessage.contains("divide"), e.getMessage)
  }

  test("pqAdcTopK refuses query sets beyond maxQueries (LUTs are driver state)") {
    val q = emb.limit(5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val e = intercept[IllegalArgumentException] {
      Similarity.pqAdcTopK(emb, q, "vec_id", "embedding", "qid", "qvec",
        k = 3, maxQueries = 4)
    }
    assert(e.getMessage.contains("maxQueries"), e.getMessage)
  }

  test("pqAdcTopK on an empty query set returns the empty contract shape") {
    val q = emb.where(lit(false))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = Similarity.pqAdcTopK(emb, q, "vec_id", "embedding", "qid", "qvec")
    assert(out.columns.toSeq == Seq("qid", "vec_id", "adc", "rank"))
    assert(out.count() == 0)
  }

  test("ADC of a query against itself equals its own reconstruction SSE") {
    val q = emb.orderBy("vec_id").limit(4)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val adc = Similarity.pqAdcTopK(emb, q, "vec_id", "embedding",
      "qid", "qvec", k = emb.count().toInt)
      .where(col("qid") === col("vec_id"))
      .select(col("qid"), col("adc"))
    val sse = Similarity.pqEncode(emb, "vec_id", "embedding")
      .select(col("vec_id").as("qid"), round(col("sse"), 4).as("self_sse"))
    val joined = adc.join(sse, Seq("qid")).cache()
    try {
      assert(joined.count() == 4)
      assert(joined.where(col("adc") =!= col("self_sse")).count() == 0,
        "LUT lookup at a vector's own codes must reproduce its SSE exactly")
    } finally joined.unpersist()
  }

  test("ivfIncrementalAdd: ledger counts both sides, codebook from base only") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val emb = graft.queries.Tables.embeddings(spark, dir)
    val base = emb.where(col("vec_id") % 10 =!= 0)
    val batch = emb.where(col("vec_id") % 10 === 0)
    val ledger = Similarity.ivfIncrementalAdd(base, batch,
      "vec_id", "embedding", nCells = 8, seed = "v1").cache()
    try {
      val sums = ledger.agg(sum("n_base"), sum("n_new")).head()
      assert(sums.getLong(0) == base.count() && sums.getLong(1) == batch.count(),
        "every vector of both sides lands in exactly one cell")
      // incremental contract: assigning the batch against a codebook
      // trained on base ∪ batch would pick different pivots — the ledger
      // must match the BASE-only pivot assignment of the full corpus
      val fullAssign = Similarity.ivfIncrementalAdd(base, emb,
        "vec_id", "embedding", nCells = 8, seed = "v1")
        .select(col("cell"), col("n_new").as("n_all"))
      val joined = ledger.join(fullAssign, Seq("cell"))
      assert(joined.where(col("n_all") =!= col("n_base") + col("n_new"))
        .count() == 0,
        "base+batch per cell must equal assigning the union through the same codebook")
    } finally ledger.unpersist()
  }
}
