package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-statistics kernel behind `TextAnalysis.qualityFeatures` /
  * `qualityScore`.
  *
  * The pure-Column formulation ran three full-string `regexp_replace` passes
  * (alpha/digit/punct) plus an interpreted stopword `filter` HOF — and because
  * Catalyst project-collapsing re-inlines a struct construction into every
  * `getField` consumer, the whole chain evaluated ~5× per row when the score
  * combined 5 features. This kernel computes every feature in two tight
  * character scans (class counts over the original, tokens over the lowered
  * copy) and the score variant folds the arithmetic in too, so a consumer
  * costs exactly one call.
  *
  * Semantics are kept bit-identical to the Column form (verified by
  * TextAnalysisSpec parity tests):
  *   - `trim` removes ASCII spaces only (UTF8String.trim, like Spark's trim)
  *   - tokens = maximal runs of non-`\s` chars (Java regex `\s` = ASCII
  *     whitespace) of the lowercased trimmed text
  *   - alpha = codepoints in \p{L}; digits = \p{N} (Nd|Nl|No); punct =
  *     everything not letter/number/ASCII-whitespace
  *   - ratios divide double counts exactly as the Column expressions did
  */
object GraftTextUtil {

  /** The reference's English stopword profile (mirrors TextAnalysis). */
  private val enStops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "was",
      "for", "on", "are", "with", "as", "his", "they", "at", "be", "this")
      .foreach(s.add)
    s
  }

  @inline private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Canonical normalization for normalized exact dedup: Unicode NFC, then
    * SIMPLE per-codepoint lowercase (Character.toLowerCase on each code
    * point — the UnicodeData simple mapping, NOT the locale-aware full
    * mapping), then every ASCII-whitespace run (the same class the
    * tokenizers use) collapses to one space, trimmed. The simple mapping is
    * deliberate: DuckDB's lower() is utf8proc's per-codepoint mapping, so a
    * full case map (word-final 'Σ'→'ς', 'İ'→"i"+combining dot) would make
    * norm_digest parity depend on the corpus avoiding those characters.
    * Exactly DuckDB's trim(regexp_replace(lower(nfc_normalize(x)),
    * '\s+', ' ', 'g')), which the x79 oracle replays — NormalizeSpec pins
    * the final-sigma and dotted-capital-I cases. */
  def normalizeText(text: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(text.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    var pendingSpace = false
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      if (cp < 0x80 && isAsciiWs(cp.toChar)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.appendCodePoint(Character.toLowerCase(cp))
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  /** (nChars, nTokens, cpt, alphaRatio, digitRatio, punctRatio, stopRatio) */
  def stats(text: UTF8String): Array[Double] = {
    val t = text.trim().toString
    val len = t.length

    // pass A: codepoint class counts over the original trimmed text
    var n = 0L; var alpha = 0L; var num = 0L; var ws = 0L
    var i = 0
    while (i < len) {
      val cp = t.codePointAt(i)
      n += 1
      if (Character.isLetter(cp)) alpha += 1
      else {
        val ty = Character.getType(cp)
        if (ty == Character.DECIMAL_DIGIT_NUMBER || ty == Character.LETTER_NUMBER ||
            ty == Character.OTHER_NUMBER) num += 1
        else if (cp < 128 && isAsciiWs(cp.toChar)) ws += 1
      }
      i += Character.charCount(cp)
    }
    val punct = n - alpha - num - ws

    // pass B: tokens + stopword hits over the lowercased copy
    val lower = t.toLowerCase(java.util.Locale.ROOT)
    val llen = lower.length
    var nTok = 0L; var stops = 0L
    var j = 0
    while (j < llen) {
      while (j < llen && isAsciiWs(lower.charAt(j))) j += 1
      if (j < llen) {
        val start = j
        while (j < llen && !isAsciiWs(lower.charAt(j))) j += 1
        nTok += 1
        if (j - start <= 4 && enStops.contains(lower.substring(start, j))) stops += 1
      }
    }

    val nCharsD = n.toDouble
    val nTokD = math.max(nTok, 1L).toDouble
    Array(
      n.toDouble,
      nTok.toDouble,
      nCharsD / nTokD,
      alpha.toDouble / math.max(nCharsD, 1.0),
      num.toDouble / math.max(nCharsD, 1.0),
      punct.toDouble / math.max(nCharsD, 1.0),
      stops.toDouble / nTokD)
  }

  def textStatsRow(text: UTF8String): InternalRow = {
    val s = stats(text)
    new GenericInternalRow(Array[Any](
      s(0).toLong, s(1).toLong, s(2), s(3), s(4), s(5), s(6)))
  }

  /** Scalar quality score in [0,1], rounded HALF_UP to 4 decimals exactly like
    * Spark's `round(col, 4)` (BigDecimal.valueOf path). */
  def qualityScore(text: UTF8String): Double = {
    val s = stats(text)
    val cpt = s(2)
    val lengthOk = if (cpt >= 3.0 && cpt <= 12.0) 1.0 else 0.5
    val alphaOk = math.min(s(3) * 1.25, 1.0)
    val noisePenalty = math.max(0.0, 1.0 - (s(4) + s(5)) * 2)
    val stopOk = math.min(s(6) * 4, 1.0)
    val raw = lengthOk * 0.25 + alphaOk * 0.35 + noisePenalty * 0.25 + stopOk * 0.15
    java.math.BigDecimal.valueOf(raw)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}

/** Repetition statistics for Gopher-style quality filtering — one pass with
  * a per-row hash map, no explode+reshuffle of per-document n-grams. */
object GraftRepetitionUtil {

  @inline private def isJavaRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** (dupTokenRatio, topBigramRatio): share of repeated tokens
    * (1 − distinct/total) and the most frequent word-bigram's share of all
    * bigrams. Tokens = ASCII-whitespace runs of lower(trim(text)) — the
    * same tokenizer as the rest of the text stack. */
  def repetitionStats(text: UTF8String): Array[Double] = {
    val s = text.trim().toLowerCase.toString
    val len = s.length
    val tokens = new java.util.ArrayList[String]()
    var i = 0
    while (i < len) {
      while (i < len && isJavaRegexWs(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isJavaRegexWs(s.charAt(i))) i += 1
        tokens.add(s.substring(start, i))
      }
    }
    val n = tokens.size()
    if (n == 0) return Array(0.0, 0.0)
    val distinct = new java.util.HashSet[String](tokens).size()
    val dupTokenRatio = 1.0 - distinct.toDouble / n.toDouble

    var topBigramRatio = 0.0
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Int]()
      var maxCount = 0
      var j = 0
      while (j < n - 1) {
        val bg = tokens.get(j) + '\u001F' + tokens.get(j + 1)
        val c = counts.merge(bg, 1, (a, b) => a + b)
        if (c > maxCount) maxCount = c
        j += 1
      }
      topBigramRatio = maxCount.toDouble / (n - 1).toDouble
    }
    Array(dupTokenRatio, topBigramRatio)
  }

  def repetitionStatsRow(text: UTF8String): InternalRow = {
    val r = repetitionStats(text)
    new GenericInternalRow(Array[Any](r(0), r(1)))
  }
}

/** `graft_repetition_stats(string) →
  * struct<dup_token_ratio double, top_bigram_ratio double>` */
case class GraftRepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("dup_token_ratio", DoubleType, nullable = false),
    StructField("top_bigram_ratio", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    GraftRepetitionUtil.repetitionStatsRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftRepetitionUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.repetitionStatsRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftRepetitionStats =
    copy(child = newChild)
}

/** `graft_text_stats(string) → struct<n_chars,n_tokens,chars_per_token,
  * alpha_ratio,digit_ratio,punct_ratio,stopword_ratio>` */
case class GraftTextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = GraftTextStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_text_stats"

  override protected def nullSafeEval(input: Any): Any =
    GraftTextUtil.textStatsRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftTextUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.textStatsRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftTextStats =
    copy(child = newChild)
}

object GraftTextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("chars_per_token", DoubleType, nullable = false),
    StructField("alpha_ratio", DoubleType, nullable = false),
    StructField("digit_ratio", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false)))
}

/** `graft_normalize(string) → string` — NFC + casefold + whitespace
  * collapse in one codegen'd kernel call, the projection in front of
  * normalized exact dedup (the groupBy then hashes the normalized form;
  * no UDF boundary in the scan). */
case class GraftNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(input: Any): Any =
    GraftTextUtil.normalizeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftTextUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.normalizeText($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftNormalize =
    copy(child = newChild)
}

/** `graft_quality_score(string) → double` — the full Gopher/C4-style score in
  * one kernel call. */
case class GraftQualityScore(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_quality_score"

  override protected def nullSafeEval(input: Any): Any =
    GraftTextUtil.qualityScore(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = GraftTextUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$util.qualityScore($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftQualityScore =
    copy(child = newChild)
}
