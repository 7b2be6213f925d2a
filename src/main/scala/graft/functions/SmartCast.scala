package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DateType, DoubleType, LongType, TimestampType}

/** Reference-parity value casting.
  *
  * Mirrors the semantics of udata-hydra's `smart_cast` / `str2bool` / `str2float`
  * (reference: analysis/csv.py:202-219, analysis/helpers.py:13-27) as pure Spark
  * `Column` builders — everything stays inside whole-stage codegen (no UDFs), so
  * the cast kernel is vectorizable and survives a 100 TB scan.
  *
  * Semantics:
  *   - ""/blank → NULL (failsafe behavior: any unparseable value → NULL, never throw)
  *   - bool: case-insensitive truthy {true,yes,1,t,y,on} / falsy {false,no,0,f,n,off}
  *   - float: plain cast, else French-locale cleanup ("1 020,20" → 1020.20,
  *     NBSP/narrow-NBSP tolerated, comma decimal separator)
  *   - int: plain cast, else via float path truncated ("2.0" → 2)
  *   - date/datetime: ISO fast path, then a format table, then a natural-language
  *     fallback handling French + English month names and ordinal suffixes
  *     ("31 décembre 2022", "31st december 2022", "12-31-2022 12:00:00").
  */
object SmartCast {

  private val Truthy = Seq("true", "yes", "1", "t", "y", "on")
  private val Falsy  = Seq("false", "no", "0", "f", "n", "off")

  /** Reference maps empty-string and None to NULL before any cast. */
  private def blankToNull(c: Column): Column =
    when(trim(c) === "", lit(null)).otherwise(trim(c))

  /** French-number cleanup: strip all whitespace (incl. NBSP U+00A0 and
    * narrow NBSP U+202F used as thousands separators), then comma → dot. */
  def cleanedNumber(c: Column): Column =
    regexp_replace(regexp_replace(c, "[\\s\\u00A0\\u202F]+", ""), ",", ".")

  def toDouble(c: Column): Column = {
    val v = blankToNull(c)
    coalesce(v.try_cast(DoubleType), cleanedNumber(v).try_cast(DoubleType))
  }

  def toLong(c: Column): Column = {
    val v = blankToNull(c)
    // int("2.0") fails in the reference, which then routes through str2float and
    // truncates — mirror with a double-path fallback cast down to long.
    coalesce(v.try_cast(LongType), toDouble(v).try_cast(LongType))
  }

  def toBooleanCol(c: Column): Column = {
    val v = lower(blankToNull(c))
    when(v.isin(Truthy: _*), lit(true))
      .when(v.isin(Falsy: _*), lit(false))
      .otherwise(lit(null).cast(BooleanType))
  }

  // --- natural-language date support -------------------------------------

  /** month-name → number, French + English, full + common abbreviations.
    * Matched by *equality* on the extracted alphabetic token (a cheap chained
    * CASE), not by 26 chained regexp_replace calls — the replace-chain version
    * blew Janino's 64 KB per-method codegen limit and fell back to interpreted
    * evaluation, which would be a disaster on a 100 TB scan. */
  private val monthNames: Seq[(String, Int)] = Seq(
    "janvier" -> 1, "février" -> 2, "fevrier" -> 2, "mars" -> 3, "avril" -> 4,
    "mai" -> 5, "juin" -> 6, "juillet" -> 7, "août" -> 8, "aout" -> 8,
    "septembre" -> 9, "octobre" -> 10, "novembre" -> 11, "décembre" -> 12,
    "decembre" -> 12,
    "january" -> 1, "february" -> 2, "march" -> 3, "april" -> 4,
    "june" -> 6, "july" -> 7, "august" -> 8, "september" -> 9,
    "october" -> 10, "november" -> 11, "december" -> 12,
    "janv" -> 1, "févr" -> 2, "fevr" -> 2, "avr" -> 4, "juil" -> 7,
    "sept" -> 9, "oct" -> 10, "nov" -> 11, "déc" -> 12, "dec" -> 12,
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5,
    "jun" -> 6, "jul" -> 7, "aug" -> 8, "sep" -> 9)

  /** NL fallback: pull the date apart (day / month-name / year / time-of-day)
    * with single regexp_extracts, map the month name via a CASE chain, and
    * reassemble into one "d M yyyy" parse. Handles "31 décembre 2022",
    * "december 31st, 2022", "31st december 2022 13:37:00". */
  private def nlTimestamp(v: Column): Column = {
    val lowered = lower(v)
    val monthTok = regexp_extract(lowered, "(\\p{L}{3,})", 1)
    val monthNum = monthNames.foldLeft(lit(null).cast("string")) {
      case (acc, (name, num)) => when(monthTok === name, lit(num.toString)).otherwise(acc)
    }
    // first standalone 1-2 digit number (optionally with ordinal suffix) = day
    val day  = regexp_extract(lowered, "(?<!\\d)(\\d{1,2})(?:st|nd|rd|th)?(?!\\d)", 1)
    val year = regexp_extract(lowered, "(?<!\\d)(\\d{4})(?!\\d)", 1)
    val time = regexp_extract(lowered, "(\\d{1,2}:\\d{2}:\\d{2})", 1)
    val dayOr1 = when(day === "", "1").otherwise(day) // "décembre 2022" → 1st
    when(monthNum.isNotNull && (year =!= ""),
      coalesce(
        when(time =!= "", try_to_timestamp(
          concat_ws(" ", dayOr1, monthNum, year, time), lit("d M yyyy H:mm:ss"))),
        try_to_timestamp(concat_ws(" ", dayOr1, monthNum, year), lit("d M yyyy"))))
  }

  /** Numeric/ISO format table tried before the NL fallback. Cheap formats
    * first, mirroring the reference's dateutil-then-dateparser fast path. */
  private val tsFormats = Seq(
    "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd'T'HH:mm:ss", "yyyy-MM-dd",
    "dd/MM/yyyy HH:mm:ss", "dd/MM/yyyy", "dd-MM-yyyy HH:mm:ss", "dd-MM-yyyy",
    "yyyy/MM/dd", "MM-dd-yyyy HH:mm:ss", "MM-dd-yyyy",
    "MM/dd/yyyy HH:mm:ss", "MM/dd/yyyy"
  )

  def toTimestampCol(c: Column): Column = {
    val v = blankToNull(c)
    val direct = try_to_timestamp(v) +: tsFormats.map(f => try_to_timestamp(v, lit(f)))
    coalesce(direct :+ nlTimestamp(v): _*)
  }

  def toDateCol(c: Column): Column = toTimestampCol(c).cast(DateType)

  /** Dispatch on the reference's 7-type vocabulary (SURVEY §1.2). Unknown
    * types fall back to string, like analysis/csv.py:231. */
  def cast(c: Column, logicalType: String): Column = logicalType match {
    case "int"      => toLong(c)
    case "float"    => toDouble(c)
    case "bool"     => toBooleanCol(c)
    case "date"     => toDateCol(c)
    case "datetime" => toTimestampCol(c)
    case _          => c // string + json pass through raw
  }
}
