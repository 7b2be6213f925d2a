package graft.functions

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Golden-row semantics lifted from the reference's cast tests
  * (tests/test_analysis/test_analysis_csv.py:89-143). */
class SmartCastSpec extends SparkSpec {

  private def castOne[T](value: String, fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Option[T] = {
    import spark.implicits._
    val row = Seq(value).toDF("v").select(fn(col("v")).as("out")).head()
    if (row.isNullAt(0)) None else Some(row.getAs[T](0))
  }

  test("float: plain, space-thousands with dot and comma decimals") {
    assert(castOne[Double]("1 020.20", SmartCast.toDouble).contains(1020.2))
    assert(castOne[Double]("1 020,20", SmartCast.toDouble).contains(1020.2))
    assert(castOne[Double]("1020.20", SmartCast.toDouble).contains(1020.2))
    assert(castOne[Double]("-3,5", SmartCast.toDouble).contains(-3.5))
    assert(castOne[Double]("abc", SmartCast.toDouble).isEmpty)
    assert(castOne[Double]("", SmartCast.toDouble).isEmpty)
  }

  test("int: plain, '2.0' truncation via float path") {
    assert(castOne[Long]("2", SmartCast.toLong).contains(2L))
    assert(castOne[Long]("2.0", SmartCast.toLong).contains(2L))
    assert(castOne[Long]("1 020", SmartCast.toLong).contains(1020L))
    assert(castOne[Long]("x", SmartCast.toLong).isEmpty)
  }

  test("bool: truthy/falsy vocabulary, case-insensitive, else null") {
    for (t <- Seq("true", "TRUE", "yes", "1", "t", "y", "on", "On"))
      assert(castOne[Boolean](t, SmartCast.toBooleanCol).contains(true), t)
    for (f <- Seq("false", "False", "no", "0", "f", "n", "off", "OFF"))
      assert(castOne[Boolean](f, SmartCast.toBooleanCol).contains(false), f)
    assert(castOne[Boolean]("maybe", SmartCast.toBooleanCol).isEmpty)
  }

  test("date golden cases: French/English NL and ISO") {
    def d(s: String) = castOne[Date](s, SmartCast.toDateCol).map(_.toString)
    assert(d("31 décembre 2022").contains("2022-12-31"))
    assert(d("31st december 2022").contains("2022-12-31"))
    assert(d("2022-12-31").contains("2022-12-31"))
    assert(d("31/12/2022").contains("2022-12-31"))
    assert(d("not a date").isEmpty)
  }

  test("datetime golden cases: yyyy-dd-MM and MM-dd-yyyy forms") {
    def ts(s: String) = castOne[Timestamp](s, SmartCast.toTimestampCol).map(_.toString)
    assert(ts("2022-31-12 12:00:00").contains("2022-12-31 12:00:00.0"))
    assert(ts("12-31-2022 12:00:00").contains("2022-12-31 12:00:00.0"))
    assert(ts("2022-12-31 12:00:00").contains("2022-12-31 12:00:00.0"))
    assert(ts("31 décembre 2022 13:37:00").contains("2022-12-31 13:37:00.0"))
  }

  test("ISO timezone offsets shift to UTC instead of being dropped") {
    def ts(s: String) = castOne[Timestamp](s, SmartCast.toTimestampCol).map(_.toString)
    // session is UTC, so the rendered value IS the UTC instant
    assert(ts("2022-01-01T00:00:00+02:00").contains("2021-12-31 22:00:00.0"))
    assert(ts("2022-01-01T12:00:00-05:00").contains("2022-01-01 17:00:00.0"))
    assert(ts("2022-01-01T12:00:00Z").contains("2022-01-01 12:00:00.0"))
    assert(ts("2022-01-01T12:00:00").contains("2022-01-01 12:00:00.0"))
  }

  test("blank and whitespace-only → NULL for every type") {
    for (v <- Seq("", "  ")) {
      assert(castOne[Double](v, SmartCast.toDouble).isEmpty)
      assert(castOne[Long](v, SmartCast.toLong).isEmpty)
      assert(castOne[Boolean](v, SmartCast.toBooleanCol).isEmpty)
      assert(castOne[Date](v, SmartCast.toDateCol).isEmpty)
    }
  }
}
