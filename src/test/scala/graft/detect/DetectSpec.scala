package graft.detect

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec

class CsvSnifferSpec extends SparkSpec {

  private def tmpCsv(content: String, charset: String = "UTF-8"): String = {
    val f = Files.createTempFile("graft", ".csv")
    Files.write(f, content.getBytes(charset))
    f.toString
  }

  test("sniffs comma and semicolon separators") {
    val c = CsvSniffer.sniff(tmpCsv("a,b,c\n1,2,3\n4,5,6\n"))
    assert(c.separator == "," && c.headerRowIdx == 0 && c.header == Seq("a", "b", "c"))
    val s = CsvSniffer.sniff(tmpCsv("a;b;c\n1;2;3\n"))
    assert(s.separator == ";")
  }

  test("quoted separators don't confuse the sniff") {
    val d = CsvSniffer.sniff(tmpCsv("name,desc\n\"x\",\"a;b;c;d;e\"\n\"y\",\"p;q;r;s;t\"\n"))
    assert(d.separator == ",")
  }

  test("detects preamble header row") {
    val d = CsvSniffer.sniff(tmpCsv("my export 2024\ncol1,col2\n1,2\n3,4\n"))
    assert(d.headerRowIdx == 1 && d.header == Seq("col1", "col2"))
  }

  test("blank lines before the header: headerRowIdx is a RAW line index") {
    // a blank first line + a title line; the consumer drops RAW lines, so
    // the index must count the blank one too
    val d = CsvSniffer.sniff(tmpCsv("\nmy export 2024\ncol1,col2\n1,2\n3,4\n"))
    assert(d.headerRowIdx == 2, d.toString)
    assert(d.header == Seq("col1", "col2"))
    // end-to-end: the ingested table must carry the real header
    val wh = Files.createTempDirectory("blankwh").toString
    val res = graft.ingest.CsvIngest.analyseCsv(spark,
      tmpCsv("\nmy export 2024\ncol1,col2\n1,2\n3,4\n"), "http://x/b.csv", wh)
    assert(res.inspection.header == Seq("col1", "col2"))
    assert(res.rowCount == 2L)
  }

  test("empty file raises the reference's error string") {
    val e = intercept[CsvSniffer.ParseException](CsvSniffer.sniff(tmpCsv("")))
    assert(e.getMessage.contains("list index out of range"))
  }

  test("ragged head raises the reference's error string") {
    val e = intercept[CsvSniffer.ParseException](
      CsvSniffer.sniff(tmpCsv("a,b,c\n1,2\n1,2,3,4\n5\n6,7\n")))
    assert(e.getMessage.contains("Number of columns is not even across the first 10 rows"))
  }

  test("UTF-8 BOM and latin-1 detection") {
    val bom = "﻿a,b\n1,2\n"
    val d = CsvSniffer.sniff(tmpCsv(bom))
    assert(d.encoding == "utf-8" && d.header == Seq("a", "b"))
    val f = Files.createTempFile("graft", ".csv")
    Files.write(f, "ville,nom\nParis,café\n".getBytes(StandardCharsets.ISO_8859_1))
    assert(CsvSniffer.sniff(f.toString).encoding == "latin-1")
  }
}

class TypeInferenceSpec extends SparkSpec {

  test("votes the strictest type per column") {
    import spark.implicits._
    val df = Seq(
      ("1", "1 020,20", "test", "true", "2022-12-31", "2022-12-31 12:00:00", """{"a":1}"""),
      ("2", "7.5", "x", "false", "2023-01-01", "2023-01-01 00:00:01", """[1,2]"""),
      ("3", "", "", "", "", "", "")
    ).toDF("i", "f", "s", "b", "d", "dt", "j")
    val types = TypeInference.infer(df).map { case (k, v) => k -> v.pythonType }
    assert(types("i") == "int")
    assert(types("f") == "float")
    assert(types("s") == "string")
    assert(types("b") == "bool")
    assert(types("d") == "date")
    assert(types("dt") == "datetime")
    assert(types("j") == "json")
  }

  test("castAll produces the 7-type schema") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val df = Seq(("1", "2,5", "yes", "31 décembre 2022")).toDF("i", "f", "b", "d")
    val out = TypeInference.castAll(df, TypeInference.infer(df))
    assert(out.schema("i").dataType == LongType)
    assert(out.schema("f").dataType == DoubleType)
    assert(out.schema("b").dataType == BooleanType)
    assert(out.schema("d").dataType == DateType)
    val r = out.head()
    assert(r.getLong(0) == 1L && r.getDouble(1) == 2.5 && r.getBoolean(2))
  }
}

class ProfilerSpec extends SparkSpec {

  test("one-pass stats + single-shuffle top-k") {
    import spark.implicits._
    val df = Seq(
      (1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "b"), (4L, 40.0, null)
    ).toDF("id", "v", "s")
    val p = Profiler.profile(df, topK = 2)
    val v = p("v")
    assert(v.min.contains(10.0) && v.max.contains(40.0) && v.mean.contains(25.0))
    assert(v.nbMissingValues == 0 && v.nbDistinct == 4)
    val s = p("s")
    assert(s.nbMissingValues == 1 && s.nbDistinct == 2)
    assert(s.tops.head == ("a", 2L))
  }
}

class OnePassProfilerSpec extends SparkSpec {

  test("one-pass profile agrees with the two-pass profiler on exact stats") {
    import spark.implicits._
    val df = Seq(
      (1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "b"), (4L, 40.0, null)
    ).toDF("id", "v", "s")
    val one = OnePassProfiler.profile(df, topK = 2)
    val two = Profiler.profile(df, topK = 2)
    for (c <- Seq("id", "v", "s")) {
      assert(one(c).min == two(c).min, c)
      assert(one(c).max == two(c).max, c)
      assert(one(c).mean == two(c).mean, c)
      assert(one(c).nbMissingValues == two(c).nbMissingValues, c)
      assert(one(c).tops.headOption.map(_._1) == two(c).tops.headOption.map(_._1), c)
      one(c).std.zip(two(c).std).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, c) }
    }
    // no eviction at tiny cardinalities → distinct counts are EXACT
    assert(one("s").nbDistinct == 2L && one("v").nbDistinct == 4L)
  }

  test("one-pass profile: heavy hitters survive across partitions") {
    import spark.implicits._
    val df = ((1 to 500).map(_ => "common") ++ (1 to 40).map(i => s"rare$i"))
      .toDF("s").repartition(8)
    val p = OnePassProfiler.profile(df, topK = 1, trackCapacity = 16)
    assert(p("s").tops.head._1 == "common")
    assert(p("s").tops.head._2 >= 500L - 16L) // MG undercount bounded by capacity
  }

  test("distinct count is exact whenever cardinality fits the tracking capacity") {
    import spark.implicits._
    // 1000 distinct values across 8 partitions, capacity comfortably above:
    // the no-eviction path must report the true cardinality, not a
    // linear-counting estimate (1000 distinct would estimate with ±~2% off
    // a 4096-bit bitmap — this asserts EXACTNESS, so it fails if the
    // estimator path is taken)
    val df = (1 to 3000).map(i => s"val${i % 1000}").toDF("s").repartition(8)
    val p = OnePassProfiler.profile(df, topK = 3, trackCapacity = 4096)
    assert(p("s").nbDistinct == 1000L, s"expected exact 1000, got ${p("s").nbDistinct}")
    // counts are exact too: every value appears exactly 3 times; top-k
    // tie-breaks by value ascending
    assert(p("s").tops == Seq(("val0", 3L), ("val1", 3L), ("val10", 3L)))
  }

  test("past eviction the distinct estimate still lands near truth") {
    import spark.implicits._
    val df = (1 to 2000).map(i => s"v$i").toDF("s").repartition(4)
    val p = OnePassProfiler.profile(df, topK = 1, trackCapacity = 64)
    val d = p("s").nbDistinct
    assert(d >= 1700 && d <= 2300, s"estimate $d too far from 2000")
  }
}
