package graft.detect

import org.apache.spark.sql.types.{DateType, DoubleType}

import graft.SparkSpec

/** Format → cast wiring (SURVEY A5 polish): a detected format must
  * SURVIVE into the ColumnInfo that drives the ingest cast, and the cast
  * must land the column typed — detection and casting are one path, not
  * adjacent features. */
class FrDateIngestE2eSpec extends SparkSpec {

  test("date_fr column arrives typed DateType AND format-annotated") {
    import spark.implicits._
    val df = Seq(
      ("12 janvier 2023", "a"), ("3 février 2024", "b"),
      ("25 décembre 2022", "c")).toDF("jour", "v")
    val types = FormatDetector.inferWithFormats(df)
    // the annotation must survive the compatibility gate (date_fr's
    // declared python type is date, same as the inferred type)
    assert(types("jour").pythonType == "date", types.toString)
    assert(types("jour").format == "date_fr", types.toString)
    val cast = TypeInference.castAll(df, types)
    assert(cast.schema("jour").dataType == DateType)
    val got = cast.select("jour").collect().map(_.getDate(0).toString).sorted
    assert(got.sameElements(Array("2022-12-25", "2023-01-12", "2024-02-03")))
  }

  test("latitude_wgs float column keeps both its type and its format") {
    import spark.implicits._
    val df = Seq("45.25", "-12.5", "89.9", "0.0").toDF("lat")
    val types = FormatDetector.inferWithFormats(df)
    assert(types("lat").pythonType == "float", types.toString)
    assert(types("lat").format == "latitude_wgs", types.toString)
    val cast = TypeInference.castAll(df, types)
    assert(cast.schema("lat").dataType == DoubleType)
  }
}
