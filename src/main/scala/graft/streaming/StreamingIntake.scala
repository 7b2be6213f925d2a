package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Streaming training-data intake: the batch TrainingDataPipeline's gate
  * semantics applied to a continuously-arriving document stream.
  *
  * Every stage is chosen for the streaming execution model: the quality and
  * language gates are STATELESS projections/filters (same native kernels as
  * batch, so batch and stream agree document-for-document); exact dedup is
  * the watermark-bounded digest state of StreamingDedup; the running intake
  * report is a standard watermarked window aggregation. Near-dup candidates
  * come from StreamingDedup.minhashCandidates downstream when needed —
  * kept out of here so the intake path stays one stateful operator deep. */
object StreamingIntake {

  /** Gate + dedup a streaming corpus. Input needs (idCol, textCol, tsCol).
    * Output = input rows that survive, plus __n_tokens / __lang columns. */
  def clean(
      docs: DataFrame,
      textCol: String = "text",
      tsCol: String = "ts",
      minQuality: Double = 0.3,
      keepLangs: Seq[String] = Nil,
      watermark: String = "10 minutes"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val gated = docs
      .withColumn("__lang", TextAnalysis.langId(col(textCol)))
      .where(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .where(if (keepLangs.isEmpty) lit(true) else col("__lang").isin(keepLangs: _*))
      .withColumn("__n_tokens", TextAnalysis.tokenCount(col(textCol)))
    StreamingDedup.exactWithinWatermark(gated, textCol, tsCol, watermark)
  }

  /** Windowed intake accounting over a CLEANED stream: documents and tokens
    * admitted per event-time window — the streaming analog of the batch
    * pipeline's Report, emitted continuously.
    *
    * The input's existing watermark (set by clean()) is reused: Spark
    * disallows redefining a watermark between chained stateful operators.
    * Pass `watermark` only for a stream that does not carry one yet. */
  def intakeReport(
      cleaned: DataFrame,
      tsCol: String = "ts",
      window: String = "5 minutes",
      watermark: String = ""): DataFrame = {
    val marked =
      if (watermark.nonEmpty) cleaned.withWatermark(tsCol, watermark) else cleaned
    marked
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(count(lit(1)).as("docs"), sum(col("__n_tokens")).as("tokens"))
      .select(col("window.start").as("window_start"), col("docs"), col("tokens"))
  }
}
