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

  /** Date/datetime parsing is a native Catalyst expression (SmartToTimestamp,
    * one static call in codegen) — see SmartTimestampExpression.scala. The
    * session must have it registered (GraftFunctions.register / extensions). */
  def toTimestampCol(c: Column): Column =
    call_function("smart_to_timestamp", blankToNull(c))

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
