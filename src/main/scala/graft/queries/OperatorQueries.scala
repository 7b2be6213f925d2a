package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis, TrainingDataPipeline}

/** LLM-pipeline operators (graft.operators) exposed through the driver's
  * query/oracle contract. Hash-based ops (minhash/simhash/xxhash sketches)
  * have no DuckDB equivalent → rows-only entries; everything expressible in
  * ANSI SQL carries an oracle. */
object OperatorQueries {

  import NamedQuery.{rowsOnly, sql}

  def all: Map[String, NamedQuery] = Map(

    // Dedup.exact over documents: duplicate groups by content digest.
    "x06_dedup_groups" -> sql(
      (s, dir) =>
        Dedup.exact(Tables.documents(s, dir), "text", "doc_id")
          .select("digest", "n_dups", "keep_id")
          .orderBy("digest"),
      """SELECT md5(text) AS digest, count(*) AS n_dups, min(doc_id) AS keep_id
        |FROM documents GROUP BY text HAVING count(*) > 1 ORDER BY digest""".stripMargin),

    // MinHash-LSH near-duplicate pairs (banded xxhash64 — not SQL-expressible).
    "x07_minhash_neardup" -> rowsOnly(
      (s, dir) =>
        Dedup.minhashNearDuplicates(Tables.documents(s, dir), "text", "doc_id",
          shingleSize = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
          .withColumn("jaccard", round(col("jaccard"), 4))
          .orderBy("id_a", "id_b")),

    // SimHash near-duplicate pairs.
    "x08_simhash_neardup" -> rowsOnly(
      (s, dir) =>
        Dedup.simhashNearDuplicates(Tables.documents(s, dir), "text", "doc_id",
          maxDistance = 4)
          .orderBy("id_a", "id_b")),

    // n-gram Jaccard near-duplicate pairs (inverted-index join).
    "x09_ngram_jaccard" -> rowsOnly(
      (s, dir) =>
        Dedup.ngramJaccardPairs(Tables.documents(s, dir), "text", "doc_id",
          n = 5, threshold = 0.8)
          .withColumn("jaccard", round(col("jaccard"), 4))
          .orderBy("id_a", "id_b")),

    // BPE-ish token counting — same regex runs in DuckDB's RE2.
    "x10_token_bpe" -> sql(
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextAnalysis.tokenCountBpe(col("text")).as("n_bpe"))
          .orderBy("doc_id"),
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin),

    // Quality features (subset with clean SQL equivalents), rounded.
    "x11_quality_features" -> sql(
      (s, dir) => {
        val f = TextAnalysis.qualityFeatures(col("text"))
        Tables.documents(s, dir)
          .select(col("doc_id"),
            f.getField("n_tokens").as("n_tokens"),
            round(f.getField("chars_per_token"), 4).as("chars_per_token"),
            round(f.getField("alpha_ratio"), 4).as("alpha_ratio"),
            round(f.getField("stopword_ratio"), 4).as("stopword_ratio"))
          .orderBy("doc_id")
      },
      """WITH t AS (
        |  SELECT doc_id, trim(text) AS txt,
        |    list_filter(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
        |      x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  round(CAST(length(txt) AS DOUBLE) / greatest(len(toks), 1), 4) AS chars_per_token,
        |  round(CAST(length(regexp_replace(txt, '[^\p{L}]', '', 'g')) AS DOUBLE)
        |        / greatest(CAST(length(txt) AS DOUBLE), 1.0), 4) AS alpha_ratio,
        |  round(CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it',
        |    'that','was','for','on','are','with','as','his','they','at','be','this'))) AS DOUBLE)
        |        / greatest(len(toks), 1), 4) AS stopword_ratio
        |FROM t ORDER BY doc_id""".stripMargin),

    // Language ID heuristic (argmax over stopword profiles) — rows-only.
    "x12_langid" -> rowsOnly(
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
          .groupBy("lang_pred").agg(count(lit(1)).as("n"))
          .orderBy("lang_pred")),

    // Brute-force cosine top-k over embeddings: the ANN correctness baseline.
    // Queries = 20 lowest vec_ids, broadcast against the corpus. The oracle
    // reproduces the same double-precision left-to-right dot products —
    // verified bit-for-bit before rounding at sf0.01.
    "x13_cosine_topk" -> sql(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.orderBy("vec_id").limit(20)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
          "qid", "qvec", k = 5)
          .select(col("qid"), col("vec_id"), round(col("sim"), 4).as("sim"),
            col("rank").cast("long").as("rank"))
          .orderBy("qid", "rank")
      },
      """WITH emb AS (SELECT vec_id, embedding FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding AS qvec FROM emb ORDER BY vec_id LIMIT 20),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |    list_dot_product(q.qvec::DOUBLE[], e.embedding::DOUBLE[]) /
        |    (sqrt(list_dot_product(q.qvec::DOUBLE[], q.qvec::DOUBLE[])) *
        |     sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS sim
        |  FROM q JOIN emb e ON e.vec_id <> q.qid),
        |ranked AS (SELECT qid, vec_id, round(sim, 4) AS sim,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT qid, vec_id, sim, rank FROM ranked WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin),

    // LSH-bucketed ANN (hyperplane sketches) — the scale path.
    "x14_cosine_lsh_topk" -> rowsOnly(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.orderBy("vec_id").limit(20)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.lshTopK(emb, queries, "vec_id", "embedding",
          "qid", "qvec", k = 5, nBits = 16, probeHamming = 3, dim = 64)
          .select(col("qid"), col("vec_id"), round(col("sim"), 4).as("sim"), col("rank"))
          .orderBy("qid", "rank")
      }),

    // IVF ANN top-k: KMeans coarse quantizer + nProbe cell probing.
    "x16_cosine_ivf_topk" -> rowsOnly(
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val queries = emb.orderBy("vec_id").limit(20)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
          "qid", "qvec", k = 5, nCentroids = 16, nProbe = 4)
          .select(col("qid"), col("vec_id"), round(col("sim"), 4).as("sim"), col("rank"))
          .orderBy("qid", "rank")
      }),

    // Multimodal plumbing through the query surface: documents become
    // binary media blobs (deterministic), flow through the stub codec's
    // probe + feature extraction, and the pseudo-embeddings feed the same
    // near-dup machinery as real embeddings would.
    "x18_multimodal_features" -> rowsOnly(
      (s, dir) => {
        val media = Tables.documents(s, dir)
          .select(col("doc_id").as("media_id"), lit("image").as("kind"),
            col("text").cast("binary").as("bytes"),
            struct(lit(null).cast("string").as("format"),
              lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
              lit(null).cast("long").as("duration_ms")).as("meta"))
        val probed = Multimodal.withProbedMeta(Multimodal.repartitionBySize(media, 32))
        val feats = Multimodal.extractFeatures(probed, dim = 16)
        feats.select(col("media_id"),
          round(aggregate(col("embedding"), lit(0.0), (a, v) => a + v.cast("double")), 4)
            .as("feat_sum"))
          .orderBy("media_id")
      }),

    // The composed training-data pipeline: quality -> lang -> exact dedup ->
    // near dedup -> token accounting, reported as one row.
    "x17_training_pipeline" -> rowsOnly(
      (s, dir) => {
        val (_, r) = TrainingDataPipeline.clean(
          Tables.documents(s, dir), minQuality = 0.2, nearDupThreshold = 0.8)
        import s.implicits._
        Seq((r.input, r.afterQuality, r.afterLang, r.afterExactDedup,
          r.afterNearDedup, r.totalTokens))
          .toDF("input", "after_quality", "after_lang", "after_exact_dedup",
            "after_near_dedup", "total_tokens")
      }),

    // Embedding near-duplicates by cosine within LSH buckets.
    "x15_embedding_neardup" -> rowsOnly(
      (s, dir) =>
        Similarity.cosineNearDuplicates(Tables.embeddings(s, dir),
          "vec_id", "embedding", threshold = 0.3, nBits = 8, dim = 64)
          .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("sim"))
          .orderBy("id_a", "id_b"))
  )
}
