package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for context-window preparation: split each document
  * into overlapping token windows of at most `maxTokens` whitespace tokens,
  * advancing by `maxTokens - overlap` per chunk — the standard long-document
  * treatment before sequence packing (every published pretraining recipe
  * chunks or truncates; the overlap preserves cross-boundary context).
  *
  * Pure projection + explode: no shuffle, no state — chunking rides the
  * document scan, and the row multiplication is bounded by
  * ceil(tokens/stride) per document. Compose with Sharding/SequencePacking
  * downstream for the packed-batches shape.
  */
object Chunking {

  /** (doc_id, chunk_idx, n_tokens, chunk_text) rows; documents with no
    * tokens produce no chunks. Tokenization is whitespace splitting of the
    * trimmed text, case-preserving (chunks are VERBATIM document slices —
    * unlike the scoring kernels, nothing here may normalize). */
  def chunkByTokens(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxTokens: Int = 512,
      overlap: Int = 64): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens, "need 0 <= overlap < maxTokens")
    val stride = maxTokens - overlap

    val toks: Column = filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    // last chunk index: floor((n - maxTokens + stride - 1) / stride), clamped
    // at 0 — every token is covered, the final chunk may run short
    val base = df
      .select(col(idCol), toks.as("__toks"), size(toks).as("__n"))
      .where(col("__n") > 0)
      .withColumn("__last", greatest(lit(0L),
        floor((col("__n") - lit(maxTokens) + lit(stride - 1)).cast("double") / stride)
          .cast("long")))
    base
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0L), col("__last"))).as("chunk_idx"))
      .select(
        col(idCol),
        col("chunk_idx"),
        least(lit(maxTokens.toLong), col("__n") - col("chunk_idx") * stride)
          .as("n_tokens"),
        concat_ws(" ",
          slice(col("__toks"), (col("chunk_idx") * stride + 1).cast("int"), lit(maxTokens)))
          .as("chunk_text"))
  }
}
