package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics and TF-IDF term weighting — the
  * frequency-analysis leg of a training-data pipeline (vocabulary
  * construction for tokenizer training, per-document keyword extraction
  * for topic mixing/filter rules).
  *
  * Scale shape: both operators are explode → hash-aggregate pipelines.
  * Term counting is a map-side-partial aggregation, so stopword skew
  * (the "the" key holding 5% of all postings) collapses on the map side
  * before the exchange — the shuffled volume is distinct-terms-sized, not
  * postings-sized. Nothing touches the driver; the corpus size for IDF is
  * a 1-row broadcast.
  */
object Vocabulary {

  /** Whitespace tokens, lowercased, empties dropped — the same
    * tokenization contract as Dedup.shingles/NgramLm (and the DuckDB
    * oracles' string_split_regex replay). */
  private def tokens(textCol: Column): Column =
    filter(split(lower(trim(textCol)), "\\s+"), t => t =!= "")

  /** Corpus term statistics: one row per distinct term with
    * (term, tf = total occurrences, df = documents containing it).
    * Two aggregations fused in one pass: explode to (doc, term), then a
    * single groupBy(term) computing count(*) and count_distinct(doc).
    * count_distinct's dedup runs inside the partial aggregation, so the
    * exchange carries (term, doc)-distinct rows at worst. */
  def termStats(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).as("__doc"), explode(tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(
        count(lit(1)).as("tf"),
        count_distinct(col("__doc")).as("df"))

  /** Top-k terms per document by TF-IDF, score = tf_doc * ln(N / df)
    * (natural log, raw counts — the textbook form). N = documents with at
    * least one token. The ranking orders on the score ROUNDED to 4 decimals
    * with the term as tie-break, so the top-k is stable and replayable in
    * another engine (a raw-double ordering could flip on a last-ulp ln()
    * difference between libms). Output: (id, rank, term, tf, df, score).
    *
    * Plan: the text explodes exactly ONCE — per-(doc, term) counts shuffle
    * on (doc, term), then df rides a count() window over the term
    * partitioning of that same (doc, term)-distinct table (no join, no
    * second pass over text). N comes from the raw docs without exploding
    * (a tokenize-and-size scan), broadcast as a 1-row cross-join — never a
    * global window. */
  def tfIdfTopTerms(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val postings = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
    val perDoc = postings.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // df = rows per term of the (doc, term)-distinct aggregate; a window
    // over a term-partitioned exchange of perDoc, not a join back to a
    // second postings aggregation
    val withDf = perDoc.withColumn("df",
      count(lit(1)).over(Window.partitionBy("term")))
    val nDocs = docs
      .where(size(tokens(col(textCol))) > 0)
      .agg(count_distinct(col(idCol)).as("n_docs"))

    val w = Window.partitionBy("id").orderBy(desc("score"), col("term"))
    withDf
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("id", "rank", "term", "tf", "df", "score")
  }
}
