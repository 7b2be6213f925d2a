package graft.functions

import java.time.{LocalDate, LocalDateTime, LocalTime, ZoneOffset}
import java.util.regex.Pattern

/** Compact JVM smart date/datetime parser — the evaluation core of the
  * `smart_to_timestamp` Catalyst expression.
  *
  * Re-creates the semantics of the reference's `_parse_dt` fast-path/fallback
  * (analysis/helpers.py:13-27: dateutil first, dateparser for natural-language
  * French/English dates) with regex dispatch instead of exception-driven
  * format trials: one pattern match picks the shape, then fields are read
  * directly. No DateTimeFormatter trial chain, no codegen blow-up — the
  * generated code for the expression is a single static call.
  *
  * Divergence from dateutil, on purpose: ambiguous "a/b/yyyy" numeric dates
  * resolve DAY-FIRST (dateutil is US month-first). The reference's corpus is
  * data.gouv.fr — French day-first data; its own golden cases are unambiguous
  * either way ("12-31-2022" forces month-first, handled below).
  */
object SmartDateUtil {

  private val Iso = Pattern.compile(
    """^(\d{4})-(\d{1,2})-(\d{1,2})(?:[T ](\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d{1,9}))?)?(Z|[+-]\d{2}:?\d{2})?)?$""")
  private val Dmy = Pattern.compile(
    """^(\d{1,2})([/-])(\d{1,2})\2(\d{4})(?:[T ](\d{1,2}):(\d{2})(?::(\d{2}))?)?$""")
  private val Ymd = Pattern.compile(
    """^(\d{4})/(\d{1,2})/(\d{1,2})(?:[ ](\d{1,2}):(\d{2})(?::(\d{2}))?)?$""")
  private val NlDay = Pattern.compile("""(?<!\d)(\d{1,2})(?:st|nd|rd|th)?(?!\d)""")
  private val NlYear = Pattern.compile("""(?<!\d)(\d{4})(?!\d)""")
  private val NlTime = Pattern.compile("""(\d{1,2}):(\d{2})(?::(\d{2}))?""")
  private val NlWord = Pattern.compile("""[\p{L}]{3,}""")

  /** French + English month vocabulary incl. common abbreviations. */
  private val months: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    val entries = Seq(
      "janvier" -> 1, "février" -> 2, "fevrier" -> 2, "mars" -> 3, "avril" -> 4,
      "mai" -> 5, "juin" -> 6, "juillet" -> 7, "août" -> 8, "aout" -> 8,
      "septembre" -> 9, "octobre" -> 10, "novembre" -> 11, "décembre" -> 12,
      "decembre" -> 12,
      "january" -> 1, "february" -> 2, "march" -> 3, "april" -> 4, "may" -> 5,
      "june" -> 6, "july" -> 7, "august" -> 8, "september" -> 9,
      "october" -> 10, "november" -> 11, "december" -> 12,
      "janv" -> 1, "févr" -> 2, "fevr" -> 2, "avr" -> 4, "juil" -> 7,
      "sept" -> 9, "oct" -> 10, "nov" -> 11, "déc" -> 12, "dec" -> 12,
      "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4,
      "jun" -> 6, "jul" -> 7, "aug" -> 8, "sep" -> 9)
    entries.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** Parse to epoch microseconds UTC (Spark's TimestampType physical value),
    * or null when unparseable — the smart-cast failsafe contract. */
  def parseMicrosBoxed(s: org.apache.spark.unsafe.types.UTF8String): java.lang.Long = {
    if (s == null) return null
    parse(s.toString) match {
      case Some(ldt) => java.lang.Long.valueOf(ldt.toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L + ldt.getNano / 1000L)
      case None => null
    }
  }

  def parse(raw: String): Option[LocalDateTime] = {
    val s = raw.trim
    if (s.isEmpty) return None

    val iso = Iso.matcher(s)
    if (iso.matches()) {
      var m = iso.group(2).toInt
      var d = iso.group(3).toInt
      // golden "2022-31-12": month slot > 12 but day slot fits a month → swap
      if (m > 12 && d <= 12) { val t = m; m = d; d = t }
      val base = build(iso.group(1).toInt, m, d,
        iso.group(4), iso.group(5), iso.group(6), iso.group(7))
      // the result is a UTC wall time downstream (parseMicrosBoxed applies
      // ZoneOffset.UTC) — an explicit offset must be folded in, not dropped
      val off = iso.group(8)
      return if (off == null || off == "Z") base
      else base.map(_.minusSeconds(ZoneOffset.of(off).getTotalSeconds.toLong))
    }

    val dmy = Dmy.matcher(s)
    if (dmy.matches()) {
      val (a, b, y) = (dmy.group(1).toInt, dmy.group(3).toInt, dmy.group(4).toInt)
      // day-first unless impossible ("12-31-2022" → month-first)
      val (d, m) = if (b > 12 && a <= 12) (b, a) else (a, b)
      return build(y, m, d, dmy.group(5), dmy.group(6), dmy.group(7))
    }

    val ymd = Ymd.matcher(s)
    if (ymd.matches())
      return build(ymd.group(1).toInt, ymd.group(2).toInt, ymd.group(3).toInt,
        ymd.group(4), ymd.group(5), ymd.group(6))

    parseNaturalLanguage(s)
  }

  /** hh nullable (date-only); mm/ss/frac nullable. */
  private def build(
      y: Int, m: Int, d: Int,
      hh: String, mm: String, ss: String, frac: String = null): Option[LocalDateTime] = {
    val date =
      try LocalDate.of(y, m, d)
      catch { case _: java.time.DateTimeException => return None }
    if (hh == null) return Some(date.atStartOfDay())
    try {
      val nanos =
        if (frac == null) 0
        else (frac + "0" * (9 - frac.length)).toInt
      Some(date.atTime(LocalTime.of(
        hh.toInt,
        if (mm != null) mm.toInt else 0,
        if (ss != null) ss.toInt else 0,
        nanos)))
    } catch { case _: java.time.DateTimeException => None }
  }

  /** "31 décembre 2022", "december 31st, 2022 13:37:00", "déc 2022"… */
  private def parseNaturalLanguage(s: String): Option[LocalDateTime] = {
    val lower = s.toLowerCase
    var month = -1
    val words = NlWord.matcher(lower)
    while (month == -1 && words.find()) {
      val hit = months.get(words.group())
      if (hit != null) month = hit.intValue()
    }
    if (month == -1) return None

    val ym = NlYear.matcher(lower)
    if (!ym.find()) return None
    val year = ym.group(1).toInt

    // first 1-2 digit standalone number that is not part of a time
    val timeM = NlTime.matcher(lower)
    val timeRange: Option[(Int, Int)] = if (timeM.find()) Some((timeM.start, timeM.end)) else None
    val dm = NlDay.matcher(lower)
    var day = 1
    var found = false
    while (!found && dm.find()) {
      val inTime = timeRange.exists { case (a, b) => dm.start >= a && dm.end <= b }
      if (!inTime) { day = dm.group(1).toInt; found = true }
    }

    val date =
      try LocalDate.of(year, month, day)
      catch { case _: java.time.DateTimeException => return None }
    timeRange match {
      case Some(_) =>
        try {
          val h = timeM.group(1).toInt
          val mi = timeM.group(2).toInt
          val se = if (timeM.group(3) != null) timeM.group(3).toInt else 0
          Some(date.atTime(LocalTime.of(h, mi, se)))
        } catch { case _: java.time.DateTimeException => None }
      case None => Some(date.atStartOfDay())
    }
  }
}
