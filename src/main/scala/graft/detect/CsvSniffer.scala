package graft.detect

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.nio.file.{Files, Paths}

/** Driver-side CSV dialect sniffer (SURVEY §2-A5 / §7.3).
  *
  * Re-creates the part of csv-detective the engine consumes (reference
  * invocation analysis/csv.py:152-154): encoding, separator, header row
  * index. Runs on a bounded head sample — never the whole file — so it is
  * O(sample) on the driver no matter the input size; the full-pass work
  * (type inference, profiling) happens distributed in Spark afterwards.
  *
  * Error contract mirrors the reference's two failure modes (strings
  * asserted in tests/test_analysis/test_analysis_csv.py:256,279-280):
  * empty file → "list index out of range"; ragged head →
  * "Number of columns is not even across the first 10 rows".
  */
object CsvSniffer {

  final case class Dialect(encoding: String, separator: String, headerRowIdx: Int, header: Seq[String])

  final class ParseException(val step: String, cause: String)
      extends RuntimeException(s"$step:$cause")

  private val Candidates = Seq(',', ';', '\t', '|')
  private val SampleBytes = 256 * 1024
  private val HeadLines = 10

  def sniff(path: String): Dialect = {
    val bytes = headBytes(path)
    if (bytes.isEmpty) throw new ParseException("csv-inspection", "list index out of range")
    val (encoding, text) = decode(bytes)
    // detection works on non-empty lines, but headerRowIdx must be a RAW
    // file line index — the consumer skips that many raw lines, so a blank
    // line above the header would otherwise shift the whole parse
    val indexed = text.split("\r\n|\r|\n", -1).toSeq.zipWithIndex.filter(_._1.nonEmpty)
    if (indexed.isEmpty) throw new ParseException("csv-inspection", "list index out of range")
    val lines = indexed.map(_._1)

    val sep = detectSeparator(lines)
    val headerIdx = detectHeaderRow(lines, sep)
    val header = splitCsvLine(lines(headerIdx), sep)

    // ragged-head check, reference errors when the first 10 rows disagree
    val body = lines.slice(headerIdx, headerIdx + HeadLines).map(l => splitCsvLine(l, sep).length)
    if (body.distinct.length > 1)
      throw new ParseException("csv-inspection",
        "Number of columns is not even across the first 10 rows")

    Dialect(encoding, sep.toString, indexed(headerIdx)._2, header)
  }

  /** Bounded head sample; gzip payloads (magic 1f 8b — reference
    * utils/file.py:27-31) are transparently decompressed, still bounded. */
  private def headBytes(path: String): Array[Byte] = {
    val p = Paths.get(path)
    val size = math.min(Files.size(p), SampleBytes.toLong).toInt
    val in = Files.newInputStream(p)
    try {
      val raw = in.readNBytes(size)
      if (raw.length >= 2 && (raw(0) & 0xFF) == 0x1F && (raw(1) & 0xFF) == 0x8B) {
        val gin = new java.util.zip.GZIPInputStream(Files.newInputStream(p))
        try gin.readNBytes(SampleBytes) finally gin.close()
      } else raw
    } finally in.close()
  }

  /** Encoding: BOM first, then strict-UTF-8 validation, else latin-1
    * (the JVM-offline stand-in for chardet — SURVEY §7 "hard parts"). */
  private[detect] def decode(bytes: Array[Byte]): (String, String) = {
    if (bytes.length >= 3 && bytes(0) == 0xEF.toByte && bytes(1) == 0xBB.toByte && bytes(2) == 0xBF.toByte)
      return ("utf-8", new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8))
    if (bytes.length >= 2 && bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte)
      return ("utf-16-le", new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16LE))
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      return ("utf-16-be", new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16BE))
    val strict = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try {
      val decoded = strict.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      ("utf-8", decoded)
    } catch {
      case _: java.nio.charset.CharacterCodingException =>
        ("latin-1", new String(bytes, Charset.forName("ISO-8859-1")))
    }
  }

  /** Separator = candidate whose per-line count is high AND most consistent
    * across the head (variance-penalized frequency, quote-aware).
    * Consistency is measured against the MODAL count, not the first line's —
    * a title/preamble first line must not sink the true separator's score. */
  private[detect] def detectSeparator(lines: Seq[String]): Char = {
    val head = lines.take(HeadLines)
    Candidates.maxBy { c =>
      val counts = head.map(l => countOutsideQuotes(l, c))
      val mean = counts.sum.toDouble / counts.length
      val modal = counts.groupBy(identity).maxBy { case (k, v) => (v.length, k) }._1
      val consistent = counts.count(_ == modal)
      if (mean == 0) -1.0 else mean * consistent / counts.length
    }
  }

  private def countOutsideQuotes(line: String, c: Char): Int = {
    var inQ = false; var n = 0
    line.foreach {
      case '"' => inQ = !inQ
      case ch if ch == c && !inQ => n += 1
      case _ =>
    }
    n
  }

  /** Header row = first row whose field count matches the modal field count
    * of the sampled body and that contains no purely-numeric cell (title /
    * comment lines above real headers fail one of the two). */
  private[detect] def detectHeaderRow(lines: Seq[String], sep: Char): Int = {
    val head = lines.take(HeadLines)
    val counts = head.map(l => countOutsideQuotes(l, sep) + 1)
    val modal = counts.groupBy(identity).maxBy { case (k, v) => (v.length, k) }._1
    head.indexWhere { l =>
      val fields = splitCsvLine(l, sep)
      fields.length == modal && fields.forall(f => f.nonEmpty && !isNumeric(f))
    } match {
      case -1 => 0
      case i => i
    }
  }

  private def isNumeric(s: String): Boolean =
    s.nonEmpty && s.forall(ch => ch.isDigit || ch == '.' || ch == '-' || ch == ',')

  /** Minimal RFC-4180 split for the sniffer only — Spark's univocity parser
    * does the real distributed parsing. */
  private[detect] def splitCsvLine(line: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val ch = line(i)
      if (ch == '"') {
        if (inQ && i + 1 < line.length && line(i + 1) == '"') { cur += '"'; i += 1 }
        else inQ = !inQ
      } else if (ch == sep && !inQ) { out += cur.result(); cur.clear() }
      else cur += ch
      i += 1
    }
    out += cur.result()
    out.result().map(_.trim)
  }
}
