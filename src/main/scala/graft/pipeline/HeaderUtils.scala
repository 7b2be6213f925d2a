package graft.pipeline

/** B8–B12 — pure header/mime/url helper functions (reference: utils/csv.py,
  * crawl/helpers.py:9-44, utils/file.py:27-31, analysis/resource.py:92). */
object HeaderUtils {

  /** B8: magic-byte mime sniffing — the small table of signatures the
    * reference's libmagic call actually matters for (gzip / zip / ole2-xls /
    * plain text). */
  def sniffMime(head: Array[Byte]): String = {
    def at(i: Int) = if (i < head.length) head(i) & 0xFF else -1
    if (at(0) == 0x1F && at(1) == 0x8B) "application/gzip"
    else if (at(0) == 'P' && at(1) == 'K' && at(2) == 0x03 && at(3) == 0x04) "application/zip"
    else if (at(0) == 0xD0 && at(1) == 0xCF && at(2) == 0x11 && at(3) == 0xE0)
      "application/vnd.ms-excel" // OLE2 compound file (legacy .xls)
    else if (at(0) == '%' && at(1) == 'P' && at(2) == 'D' && at(3) == 'F') "application/pdf"
    else "text/plain"
  }

  def isGzip(head: Array[Byte]): Boolean = sniffMime(head) == "application/gzip"

  /** B9: content-type → (isTabular, format) classifier (utils/csv.py:4-43):
    * csv / csvgz (binary content-type + "csv.gz" in url) / xls / xlsx. */
  def detectTabularFromHeaders(headers: Map[String, String], url: String): (Boolean, String) = {
    val ct = headers.getOrElse("content-type", "").toLowerCase
    def startsWithAny(prefixes: String*) = prefixes.exists(ct.startsWith)
    if (startsWithAny("application/csv", "text/plain", "text/csv")) (true, "csv")
    else if (startsWithAny("application/octet-stream", "application/x-gzip", "application/gzip")
      && url.contains("csv.gz")) (true, "csvgz")
    else if (startsWithAny("application/vnd.ms-excel")) (true, "xls")
    else if (startsWithAny("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"))
      (true, "xlsx")
    else (false, "csv")
  }

  /** B10: strip parameters from a content-type (tolerates double-';' forms
    * like "text/html;h5ai=0.20;charset=UTF-8"). */
  def contentTypeMime(contentType: String): String =
    if (contentType == null || !contentType.contains(";")) contentType
    else contentType.split(";", -1).head

  /** B11: surrogate fixer — replace any unpaired surrogate with U+FFFD so
    * header values stay JSON-serializable (crawl/helpers.py:38-44). */
  def fixSurrogates(value: String): String = {
    val sb = new StringBuilder(value.length)
    var i = 0
    while (i < value.length) {
      val c = value.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 < value.length && Character.isLowSurrogate(value.charAt(i + 1))) {
          sb.append(c).append(value.charAt(i + 1)); i += 1
        } else sb.append('�')
      } else if (Character.isLowSurrogate(c)) sb.append('�')
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Lowercase header keys, fix surrogates (convert_headers). */
  def normalizeHeaders(headers: Map[String, String]): Map[String, String] =
    headers.map { case (k, v) => k.toLowerCase -> fixSurrogates(v) }

  /** B12: url validity = has scheme + host (utils/http.py:14-19). */
  def isValidUrl(url: String): Boolean =
    try {
      val u = new java.net.URI(url)
      u.getScheme != null && u.getHost != null
    } catch { case _: Exception => false }

  /** B12: domain extraction (crawl/check_resources.py:73-77). */
  def domainOf(url: String): String =
    try Option(new java.net.URI(url).getHost).getOrElse("")
    catch { case _: Exception => "" }

  /** B6: slugify for index names (analysis/csv.py:242-243): lowercase,
    * runs of non-alphanumerics → single '-', trimmed. */
  def slugify(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
      .replaceAll("[\\p{M}]", "")
      .toLowerCase
      .replaceAll("[^a-z0-9]+", "-")
      .replaceAll("(^-+)|(-+$)", "")

  /** The reference's index naming scheme: {table}_{slug(col)}_idx. */
  def indexName(tableName: String, colName: String): String =
    s"${tableName}_${slugify(colName)}_idx"

  /** E2 HEAD-quality check (crawl/helpers.py:47-54): a HEAD response is
    * useful only with a valid status AND a content-length or last-modified
    * header (otherwise the crawler falls back to GET). */
  def hasNiceHead(status: Option[Int], headers: Map[String, String]): Boolean = {
    val valid = status.exists(s => s != 429 && s >= 200 && s < 400)
    valid && Seq("content-length", "last-modified").exists(headers.contains)
  }

  /** Per-format ingest size caps in bytes (config_default.toml:52-56),
    * waived for exception resources (analysis/csv.py:138-142). */
  val MaxFilesizeAllowed: Map[String, Long] = Map(
    "csv" -> 104857600L, "csvgz" -> 104857600L,
    "xls" -> 52428800L, "xlsx" -> 13107200L, "ods" -> 10485760L)

  def sizeAllowed(format: String, size: Long, isException: Boolean): Boolean =
    isException || MaxFilesizeAllowed.get(format).forall(size <= _)
}
