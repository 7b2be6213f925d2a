package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The prefix-filtering principle in practice: prefixJaccardPairs must be
  * EXACT (identical to brute-force all-pairs — no recall parameter), while
  * generating candidates only from the df-ordered prefixes. */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(df: org.apache.spark.sql.DataFrame, t: Double) = {
    val sets = df.select(col("id"),
      array_sort(array_distinct(filter(
        split(lower(trim(col("text"))), "\\s+"), x => x =!= "")))
        .as("ws"))
    val a = sets.select(col("id").as("id_a"), col("ws").as("wa"))
    val b = sets.select(col("id").as("id_b"), col("ws").as("wb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("c", size(array_intersect(col("wa"), col("wb"))))
      .withColumn("j", col("c").cast("double") /
        (size(col("wa")) + size(col("wb")) - col("c")).cast("double"))
      .where(col("j") >= t)
      .select(col("id_a"), col("id_b"), round(col("j"), 6).as("j"))
      .collect().map(_.toString).sorted.toSeq
  }

  test("prefix-filtered join equals brute-force all-pairs at several thresholds") {
    // clusters of near-identical token sets + noise rows, word-level
    // (shingleSize=1) so the brute-force reference stays simple
    val rnd = new scala.util.Random(5)
    val base = Seq("alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine ten")
    val rows = (0L until 120L).map { i =>
      val b = base((i % 2).toInt).split(" ")
      val kept = b.filter(_ => rnd.nextDouble() > 0.15)
      val extra = if (rnd.nextBoolean()) Seq(s"tok${rnd.nextInt(30)}") else Nil
      (i, (kept ++ extra).mkString(" "))
    }
    val df = rows.toDF("id", "text")
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val got = Dedup.prefixJaccardPairs(df, "text", "id", threshold = t,
        shingleSize = 1)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("j"))
        .collect().map(_.toString).sorted.toSeq
      Dedup.releaseCaches()
      val expect = bruteForce(df, t)
      assert(got == expect, s"t=$t: ${got.size} vs ${expect.size} pairs")
      assert(expect.nonEmpty || t > 0.8, s"fixture produced no pairs at t=$t")
    }
  }

  test("empty and sub-shingle documents are handled; determinism across layouts") {
    val df = Seq((1L, "a b c d e f g"), (2L, "a b c d e f g"), (3L, ""),
      (4L, "x y"), (5L, "a b c d e f h")).toDF("id", "text")
    val a = Dedup.prefixJaccardPairs(df.repartition(1), "text", "id", 0.5, 3)
      .collect().map(_.toString).sorted.toSeq
    Dedup.releaseCaches()
    val b = Dedup.prefixJaccardPairs(df.repartition(7), "text", "id", 0.5, 3)
      .collect().map(_.toString).sorted.toSeq
    Dedup.releaseCaches()
    assert(a == b)
    // docs 1 and 2 are identical (jaccard 1.0); doc 5 shares 4 of 6
    // distinct shingles with them (4/(5+5-4) = 0.666... ≥ 0.5)
    assert(a.size == 3, a.mkString(";"))
  }
}
