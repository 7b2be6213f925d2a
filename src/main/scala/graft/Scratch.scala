package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.Tables

/** Temporary round-7 tuning harness — NOT part of the library surface;
  * deleted before the round closes. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    for (sf <- Seq("0.01", "0.1")) {
      val dir = s"/root/testdata/sf$sf"
      val emb = Tables.embeddings(spark, dir)
      val queries = emb.orderBy("vec_id").limit(20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
        "qid", "qvec", k = 5).select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

      for ((nBits, probe, nTables) <- Seq((8, 2, 8), (8, 3, 8), (8, 2, 16), (8, 3, 16), (6, 2, 8), (8, 4, 16))) {
        val ann = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
          "qid", "qvec", k = 5, nBits = nBits, probeHamming = probe, dim = 64, nTables = nTables)
          .select("qid", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = (ann & exact).size.toDouble / exact.size
        println(f"SF=$sf LSH nBits=$nBits probe=$probe tables=$nTables recall=$rec%.4f")
      }
      for ((nc, np, sph) <- Seq((16, 4, true), (16, 6, true), (16, 8, true),
          (32, 8, true), (32, 12, true), (16, 4, false))) {
        val ann = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
          "qid", "qvec", k = 5, nCentroids = nc, nProbe = np, spherical = sph)
          .select("qid", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = (ann & exact).size.toDouble / exact.size
        println(f"SF=$sf IVF nCentroids=$nc nProbe=$np spherical=$sph recall=$rec%.4f")
      }
    }
    spark.stop()
  }
}
