package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge learning — tokenizer TRAINING over a distributed corpus (the
  * serving-side token counts live in TextAnalysis; this learns the merge
  * table itself, the Sennrich et al. 2016 algorithm, public).
  *
  * Distributed shape: the corpus collapses ONCE into a (word, count)
  * vocabulary — corpus-sized work up front, vocabulary-sized work per
  * round after that. Each merge round is one aggregation job (adjacent
  * symbol-pair counts weighted by word frequency) of which the driver
  * receives exactly ONE row (the argmax pair); the merge application is a
  * narrow map over the vocabulary. At 100 TB the vocabulary (millions of
  * rows) never leaves the cluster and the driver traffic is numMerges
  * rows total.
  *
  * Determinism: the winning pair breaks ties by (count DESC, left ASC,
  * right ASC), so the merge sequence is a pure function of the corpus.
  *
  * Iterative-lineage note: each round rebuilds the vocabulary Dataset from
  * the previous round's via a map; the plan is re-rooted from the persisted
  * round (same pattern as Dedup.duplicateClusters) so the logical plan
  * stays round-sized instead of growing with numMerges.
  */
object BpeTrainer {

  /** One vocabulary entry: the word's current symbol sequence + corpus
    * frequency. Public for the Dataset encoder. */
  final case class VocabWord(syms: Seq[String], cnt: Long)

  /** Learn `numMerges` BPE merges from whitespace-tokenized, lowercased
    * text. Returns the ordered merge table (left, right) — highest-gain
    * first. Stops early when no adjacent pair remains.
    *
    * Adaptive cutover (same pattern as Dedup.duplicateClusters): the
    * corpus-sized work is the ONE word-count aggregation; when the
    * resulting vocabulary fits under `localVocabThreshold` rows it collects
    * to the driver and the merge loop runs locally — each distributed round
    * otherwise costs ~3 whole Spark jobs of latency to move one argmax row.
    * Identical merge sequence either way (BpeTrainerSpec cross-checks); the
    * distributed loop remains the path for vocabularies that don't fit. */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      localVocabThreshold: Int = 1 << 20): Seq[(String, String)] = {
    require(numMerges > 0, "numMerges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._

    val wordCounts = docs
      .select(explode(filter(split(lower(trim(col(textCol))), "\\s+"),
        t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]

    if (localVocabThreshold > 0) {
      val head = wordCounts.take(localVocabThreshold + 1)
      if (head.length <= localVocabThreshold)
        return localMerges(head.toMap, numMerges)
    }

    // corpus → (word, count) vocabulary, words as char-symbol sequences
    var vocab: Dataset[VocabWord] = wordCounts
      .map { case (w, c) => VocabWord(w.map(_.toString), c) }
      .persist()
    vocab.count()

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val top = vocab
        .flatMap(v => v.syms.iterator.zip(v.syms.iterator.drop(1))
          .map { case (a, b) => ((a, b), v.cnt) })
        .groupByKey(_._1)
        .mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), c) => (a, b, c) }
        .orderBy(desc("_3"), asc("_1"), asc("_2"))
        .take(1)
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, _) = top.head
        merges += ((a, b))
        val merged = a + b
        val next = vocab.map { v =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < v.syms.length) {
            if (i + 1 < v.syms.length && v.syms(i) == a && v.syms(i + 1) == b) {
              out += merged; i += 2
            } else { out += v.syms(i); i += 1 }
          }
          VocabWord(out.toSeq, v.cnt)
        }.persist()
        next.count() // materialize, then drop the previous round
        vocab.unpersist(blocking = false)
        vocab = next
      }
      round += 1
    }
    vocab.unpersist(blocking = false)
    merges.toSeq
  }

  /** UTF-8 binary string ordering — matches Spark's UTF8String comparison
    * (`asc("_1")` in the distributed loop), so both merge loops break ties
    * identically even for symbols in/above the surrogate range where Java's
    * UTF-16 code-unit ordering disagrees with UTF-8 byte order. */
  private val utf8Ordering: Ordering[String] = (x: String, y: String) => {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    var d = 0
    val n = math.min(a.length, b.length)
    while (d == 0 && i < n) { d = (a(i) & 0xff) - (b(i) & 0xff); i += 1 }
    if (d != 0) d else a.length - b.length
  }

  /** Driver-side merge loop for vocabularies under the cutover bound —
    * the same algorithm, zero per-round Spark jobs. */
  private def localMerges(
      counts: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Seq[String], Long] =
      counts.groupMapReduce(_._1.map(_.toString): Seq[String])(_._2)(_ + _)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val (a, b) = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }(
            Ordering.Tuple3(Ordering.Long, utf8Ordering, utf8Ordering))._1
        merges += ((a, b))
        vocab = vocab.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toSeq -> c
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    merges.toSeq
  }

  /** Serving side: tokenize text with a learned merge table. Merges apply
    * in RANK order within each word (the canonical BPE encode: repeatedly
    * merge the lowest-rank adjacent pair), exactly inverse to training.
    * The merge table broadcasts inside the closure (it is tokenizer-sized,
    * KBs to low MBs); encoding is a narrow map over the corpus — no
    * shuffle, scales linearly. Output: input columns + `tokens`
    * (array<string>) + `n_bpe_tokens`. */
  def encode(
      docs: DataFrame,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val bRanks = spark.sparkContext.broadcast(ranks)

    val encodeWord = (w: String) => {
      val r = bRanks.value
      var syms = w.map(_.toString).toVector
      var done = syms.length < 2
      while (!done) {
        var bestIdx = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i + 1 < syms.length) {
          val rk = r.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (rk < bestRank) { bestRank = rk; bestIdx = i }
          i += 1
        }
        if (bestIdx < 0) done = true
        else {
          syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
            syms.drop(bestIdx + 2)
          if (syms.length < 2) done = true
        }
      }
      syms
    }
    val encodeText = udf { (text: String) =>
      Option(text).map(_.toLowerCase.trim.split("\\s+").toSeq
        .filter(_.nonEmpty).flatMap(encodeWord)).getOrElse(Seq.empty)
    }
    docs
      .withColumn("tokens", encodeText(col(textCol)))
      .withColumn("n_bpe_tokens", size(col("tokens")).cast("long"))
  }

  /** The learned merges as a DataFrame (rank, left, right) — the
    * query-surface form of learnMerges. */
  def mergeTable(
      docs: DataFrame,
      textCol: String,
      numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, textCol, numMerges).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("rank", "left", "right")
  }
}
