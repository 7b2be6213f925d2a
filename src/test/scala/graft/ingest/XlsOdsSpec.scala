package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.detect.{OdsReader, XlsReader}

/** Fixture builders write real bytes: a BIFF8 workbook inside a hand-rolled
  * MS-CFB compound file (mini-stream layout — the one every small real .xls
  * uses), and an ODS zip with typed content.xml cells. */
object XlsFixture {

  private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def rec(t: Int, data: Array[Byte]): Array[Byte] = le16(t) ++ le16(data.length) ++ data
  private def bof(dt: Int): Array[Byte] =
    rec(0x809, le16(0x600) ++ le16(dt) ++ le16(0x0DBB) ++ le16(0x07CC) ++ le32(0) ++ le32(0x106))
  private def str16(s: String): Array[Byte] =
    le16(s.length) ++ Array(0.toByte) ++ s.getBytes("ISO-8859-1")
  private def dbl(v: Double): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putDouble(v); buf.array()
  }
  private def xfRec(fmtId: Int): Array[Byte] =
    rec(0xE0, le16(0) ++ le16(fmtId) ++ le16(0xFFF5) ++ Array.fill(14)(0.toByte))

  /** Arbitrary grid → BIFF8 workbook bytes: strings through SST+LABELSST,
    * doubles through NUMBER (general format). */
  def workbookBytesFor(grid: Seq[Seq[Any]]): Array[Byte] = {
    val strings = grid.flatten.collect { case s: String => s }.distinct.toVector
    val sstIdx = strings.zipWithIndex.toMap
    val sst = rec(0xFC, le32(strings.length) ++ le32(strings.length) ++
      strings.flatMap(str16).toArray)
    val xfs = (0 until 16).map(_ => xfRec(0)).reduce(_ ++ _)
    val cells = grid.zipWithIndex.flatMap { case (row, r) =>
      row.zipWithIndex.flatMap {
        case (s: String, c) =>
          Seq(rec(0xFD, le16(r) ++ le16(c) ++ le16(0) ++ le32(sstIdx(s))))
        case (d: Double, c) =>
          Seq(rec(0x203, le16(r) ++ le16(c) ++ le16(0) ++ dbl(d)))
        case _ => Nil
      }
    }
    val sheet = bof(0x10) ++ cells.foldLeft(Array.emptyByteArray)(_ ++ _) ++
      rec(0x0A, Array.emptyByteArray)
    def globals(sheetOffset: Int) = bof(0x05) ++ xfs ++ sst ++
      rec(0x85, le32(sheetOffset) ++ Array(0.toByte, 0.toByte) ++
        Array(6.toByte, 0.toByte) ++ "Sheet1".getBytes("ISO-8859-1")) ++
      rec(0x0A, Array.emptyByteArray)
    val offset = globals(0).length
    globals(offset) ++ sheet
  }

  /** Two-column workbook: header strings via SST, then per row a LABELSST,
    * a NUMBER (general format) and a date-formatted NUMBER (builtin fmt 14). */
  def workbookBytes(): Array[Byte] = {
    val sstStrings = Seq("name", "qty", "when", "alpha", "beta")
    val sst = rec(0xFC, le32(sstStrings.length) ++ le32(sstStrings.length) ++
      sstStrings.flatMap(str16).toArray)
    // XF 0..15 default-ish (general), XF 16 = builtin date fmt 14
    val xfs = (0 until 16).map(_ => xfRec(0)).reduce(_ ++ _) ++ xfRec(14)
    def labelSst(row: Int, col: Int, isst: Int) =
      rec(0xFD, le16(row) ++ le16(col) ++ le16(0) ++ le32(isst))
    def number(row: Int, col: Int, v: Double, xf: Int) =
      rec(0x203, le16(row) ++ le16(col) ++ le16(xf) ++ dbl(v))
    def rk(row: Int, col: Int, intVal: Int) = // integer RK: (v << 2) | 2
      rec(0x27E, le16(row) ++ le16(col) ++ le16(0) ++ le32((intVal << 2) | 2))

    val sheet = bof(0x10) ++
      labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++
      labelSst(1, 0, 3) ++ rk(1, 1, 12) ++ number(1, 2, 45000.0, 16) ++
      labelSst(2, 0, 4) ++ number(2, 1, 2.5, 0) ++ number(2, 2, 45001.0, 16) ++
      rec(0x0A, Array.emptyByteArray)

    // globals assembled twice: first pass to learn the sheet BOF offset
    def globals(sheetOffset: Int) = bof(0x05) ++ xfs ++ sst ++
      rec(0x85, le32(sheetOffset) ++ Array(0.toByte, 0.toByte) ++
        Array(6.toByte, 0.toByte) ++ "Sheet1".getBytes("ISO-8859-1")) ++
      rec(0x0A, Array.emptyByteArray)
    val offset = globals(0).length
    globals(offset) ++ sheet
  }

  /** Wrap a small stream into a minimal v3 compound file (512-byte sectors,
    * mini-stream + miniFAT for the sub-4096 Workbook stream). */
  def cfb(workbook: Array[Byte]): Array[Byte] = {
    require(workbook.length < 4096, "fixture writer only does mini-stream")
    val miniSectors = (workbook.length + 63) / 64
    val miniBytes = java.util.Arrays.copyOf(workbook, miniSectors * 64)
    val containerSectors = (miniBytes.length + 511) / 512
    val totalSectors = 3 + containerSectors
    val End = 0xFFFFFFFE; val Free = 0xFFFFFFFF

    val out = java.nio.ByteBuffer.allocate(512 * (1 + totalSectors))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // --- header ---
    out.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    out.put(new Array[Byte](16))            // clsid
    out.putShort(0x3E.toShort); out.putShort(3)   // minor/major
    out.putShort(0xFFFE.toShort)            // little-endian marker
    out.putShort(9); out.putShort(6)        // sector 512, mini 64
    out.put(new Array[Byte](6))             // reserved
    out.putInt(0)                           // num dir sectors (v3: 0)
    out.putInt(1)                           // num FAT sectors
    out.putInt(1)                           // dir start sector
    out.putInt(0)                           // transaction
    out.putInt(4096)                        // mini cutoff
    out.putInt(2)                           // miniFAT start
    out.putInt(1)                           // num miniFAT sectors
    out.putInt(End)                         // DIFAT start
    out.putInt(0)                           // num DIFAT sectors
    out.putInt(0)                           // DIFAT[0] → FAT at sector 0
    for (_ <- 1 until 109) out.putInt(Free)
    // --- sector 0: FAT ---
    out.putInt(0xFFFFFFFD)                  // sector 0 = FAT sector
    out.putInt(End)                         // sector 1 = directory
    out.putInt(End)                         // sector 2 = miniFAT
    for (k <- 0 until containerSectors)     // ministream container chain
      out.putInt(if (k == containerSectors - 1) End else 3 + k + 1)
    for (_ <- (3 + containerSectors) until 128) out.putInt(Free)
    // --- sector 1: directory (4 entries) ---
    def dirEntry(name: String, typ: Int, child: Int, start: Int, size: Int): Unit = {
      val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      val padded = java.util.Arrays.copyOf(nameBytes, 64)
      out.put(padded)
      out.putShort((nameBytes.length + 2).toShort)
      out.put(typ.toByte); out.put(1.toByte)      // black
      out.putInt(-1); out.putInt(-1); out.putInt(child)
      out.put(new Array[Byte](16))                // clsid
      out.putInt(0); out.putLong(0L); out.putLong(0L) // state, times
      out.putInt(start); out.putInt(size); out.putInt(0)
    }
    dirEntry("Root Entry", 5, 1, 3, miniBytes.length)
    dirEntry("Workbook", 2, -1, 0, workbook.length)
    out.put(new Array[Byte](256))                 // two empty entries
    // --- sector 2: miniFAT ---
    for (k <- 0 until miniSectors)
      out.putInt(if (k == miniSectors - 1) End else k + 1)
    for (_ <- miniSectors until 128) out.putInt(Free)
    // --- ministream container sectors ---
    out.put(miniBytes)
    out.put(new Array[Byte](containerSectors * 512 - miniBytes.length))
    out.array()
  }

  def write(): String = {
    val f = Files.createTempFile("fixture", ".xls")
    Files.write(f, cfb(workbookBytes()))
    f.toString
  }

  def writeOds(): String = {
    val content =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
        |  xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
        |  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
        | <office:body><office:spreadsheet>
        |  <table:table table:name="Feuille1">
        |   <table:table-row>
        |    <table:table-cell office:value-type="string"><text:p>name</text:p></table:table-cell>
        |    <table:table-cell office:value-type="string"><text:p>qty</text:p></table:table-cell>
        |    <table:table-cell office:value-type="string"><text:p>when</text:p></table:table-cell>
        |   </table:table-row>
        |   <table:table-row>
        |    <table:table-cell office:value-type="string"><text:p>alpha</text:p></table:table-cell>
        |    <table:table-cell office:value-type="float" office:value="12"><text:p>12</text:p></table:table-cell>
        |    <table:table-cell office:value-type="date" office:date-value="2023-03-15"><text:p>15/03/2023</text:p></table:table-cell>
        |   </table:table-row>
        |   <table:table-row>
        |    <table:table-cell office:value-type="string"><text:p>beta</text:p></table:table-cell>
        |    <table:table-cell office:value-type="float" office:value="2.5"><text:p>2,5</text:p></table:table-cell>
        |    <table:table-cell office:value-type="date" office:date-value="2023-03-16"><text:p>16/03/2023</text:p></table:table-cell>
        |   </table:table-row>
        |  </table:table>
        | </office:spreadsheet></office:body>
        |</office:document-content>""".stripMargin
    val f = Files.createTempFile("fixture", ".ods")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(f))
    zos.putNextEntry(new java.util.zip.ZipEntry("mimetype"))
    zos.write("application/vnd.oasis.opendocument.spreadsheet".getBytes)
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("content.xml"))
    zos.write(content.getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    f.toString
  }
}

class XlsOdsSpec extends SparkSpec {

  test("xls: OLE2 mini-stream + BIFF8 records decode, serial dates to ISO") {
    val path = XlsFixture.write()
    // the sniffer agrees this is OLE2
    val head = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)).take(8)
    assert(graft.pipeline.HeaderUtils.sniffMime(head) == "application/vnd.ms-excel")

    val sheet = XlsReader.read(path)
    assert(sheet.name == "Sheet1")
    assert(sheet.rows(0) == Vector("name", "qty", "when"))
    assert(sheet.rows(1)(0) == "alpha" && sheet.rows(1)(1) == "12")
    assert(sheet.rows(2)(1) == "2.5")
    // serial 45000/45001 under builtin date fmt 14 → ISO dates
    val d0 = java.time.LocalDate.parse(sheet.rows(1)(2))
    val d1 = java.time.LocalDate.parse(sheet.rows(2)(2))
    assert(d1 == d0.plusDays(1))
    assert(d0 == java.time.LocalDate.of(1899, 12, 30).plusDays(45000))
  }

  test("xls serial date epochs: 1900 leap-year phantom handled") {
    assert(XlsReader.serialToIso(1.0, withTime = false) == "1900-01-01")
    assert(XlsReader.serialToIso(59.0, withTime = false) == "1900-02-28")
    assert(XlsReader.serialToIso(61.0, withTime = false) == "1900-03-01")
    assert(XlsReader.serialToIso(45000.5, withTime = true) == "2023-03-15 12:00:00")
  }

  test("xls ingests end-to-end with typed columns and date inference") {
    val path = XlsFixture.write()
    val wh = Files.createTempDirectory("xlswh").toString
    val res = CsvIngest.analyseXls(spark, path, "http://x/f.xls", wh)
    assert(res.rowCount == 2L)
    assert(res.inspection.columns("qty").pythonType == "float")
    assert(res.inspection.columns("when").pythonType == "date")
    val df = spark.read.parquet(res.outputPath)
    assert(df.schema("when").dataType.typeName == "date")
    assert(df.where(col("name") === "alpha").head().getAs[java.sql.Date]("when").toString
      == java.time.LocalDate.of(1899, 12, 30).plusDays(45000).toString)
  }

  test("ods reads typed cells and ingests end-to-end") {
    val path = XlsFixture.writeOds()
    val sheet = OdsReader.read(path)
    assert(sheet.name == "Feuille1")
    assert(sheet.rows(0) == Vector("name", "qty", "when"))
    assert(sheet.rows(1) == Vector("alpha", "12", "2023-03-15"))

    val wh = Files.createTempDirectory("odswh").toString
    val res = CsvIngest.analyseOds(spark, path, "http://x/f.ods", wh)
    assert(res.rowCount == 2L)
    assert(res.inspection.columns("when").pythonType == "date")
  }

  test("xlsx serial dates decode via styles.xml date styles") {
    val f = Files.createTempFile("dates", ".xlsx")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(f))
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    entry("xl/workbook.xml",
      """<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""")
    // style 0: general; style 1: builtin date 14; style 2: custom datetime
    entry("xl/styles.xml",
      """<styleSheet><numFmts>
        |<numFmt numFmtId="164" formatCode="dd/mm/yyyy\ hh:mm"/></numFmts>
        |<cellXfs>
        |<xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/>
        |</cellXfs></styleSheet>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>
        |<row><c r="A1" t="inlineStr"><is><t>when</t></is></c></row>
        |<row><c r="A2" s="1"><v>45000</v></c></row>
        |<row><c r="A3" s="2"><v>45000.5</v></c></row>
        |<row><c r="A4" s="0"><v>45000</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()

    val sheet = graft.detect.XlsxReader.read(f.toString)
    assert(sheet.rows(1)(0) == "2023-03-15")
    assert(sheet.rows(2)(0) == "2023-03-15 12:00:00")
    assert(sheet.rows(3)(0) == "45000") // no date style → raw number untouched
  }

  test("xls round-trip property: random grids survive CFB+BIFF encode/decode") {
    val rng = new scala.util.Random(0xb1ff)
    def fmtNumber(v: Double): String =
      if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString
    var trials = 0
    while (trials < 30) {
      val nRows = 1 + rng.nextInt(20)
      val nCols = 1 + rng.nextInt(5)
      val grid: Seq[Seq[Any]] = (0 until nRows).map { _ =>
        (0 until nCols).map { _ =>
          if (rng.nextBoolean())
            new String(Array.fill(rng.nextInt(10))((32 + rng.nextInt(95)).toChar))
          else math.rint(rng.nextDouble() * 1e8) / 100.0
        }
      }
      val wb = XlsFixture.workbookBytesFor(grid)
      if (wb.length < 4000) { // fixture writer covers the mini-stream layout
        trials += 1
        val f = Files.createTempFile("prop", ".xls")
        Files.write(f, XlsFixture.cfb(wb))
        val got = XlsReader.read(f.toString).rows
        val expected = grid.map(_.map {
          case s: String => s
          case d: Double => fmtNumber(d)
        }.toVector).toVector
        assert(got == expected,
          s"grid ${nRows}x$nCols (wb ${wb.length}B) mismatch:\n$got\nvs\n$expected")
      }
    }
  }

  test("ods: mid-row repeated empty cells keep column alignment; trailing filler drops") {
    val content =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
        |  xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
        |  xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
        | <office:body><office:spreadsheet>
        |  <table:table table:name="S">
        |   <table:table-row>
        |    <table:table-cell office:value-type="string"><text:p>A</text:p></table:table-cell>
        |    <table:table-cell table:number-columns-repeated="3"/>
        |    <table:table-cell office:value-type="string"><text:p>E</text:p></table:table-cell>
        |    <table:table-cell table:number-columns-repeated="16380"/>
        |   </table:table-row>
        |   <table:table-row>
        |    <table:table-cell office:value-type="string">
        |      <text:p>line1</text:p>
        |      <text:p>line2</text:p>
        |    </table:table-cell>
        |   </table:table-row>
        |  </table:table>
        | </office:spreadsheet></office:body>
        |</office:document-content>""".stripMargin
    val f = Files.createTempFile("align", ".ods")
    val zos = new java.util.zip.ZipOutputStream(Files.newOutputStream(f))
    zos.putNextEntry(new java.util.zip.ZipEntry("content.xml"))
    zos.write(content.getBytes("UTF-8")); zos.closeEntry(); zos.close()

    val sheet = OdsReader.read(f.toString)
    // E sits in column 4 (after the 3-wide empty run); the 16k trailing
    // filler never materializes
    assert(sheet.rows(0) == Vector("A", "", "", "", "E"))
    // paragraphs join with \n; pretty-print whitespace between them is NOT
    // captured into the value
    assert(sheet.rows(1)(0) == "line1\nline2", sheet.rows(1)(0))
  }

  test("ods robustness: hostile zips fail with the parse-error contract") {
    // not a zip at all
    val junk = Files.createTempFile("junk", ".ods")
    Files.write(junk, Array.fill(256)(0x5A.toByte))
    intercept[Exception] { OdsReader.read(junk.toString) }

    // zip without content.xml
    val noContent = Files.createTempFile("nocontent", ".ods")
    val z1 = new java.util.zip.ZipOutputStream(Files.newOutputStream(noContent))
    z1.putNextEntry(new java.util.zip.ZipEntry("mimetype")); z1.write("x".getBytes); z1.closeEntry(); z1.close()
    val e1 = intercept[graft.detect.CsvSniffer.ParseException] {
      OdsReader.read(noContent.toString)
    }
    assert(e1.getMessage.startsWith("ods-inspection:"))

    // content.xml with no tables
    val noTables = Files.createTempFile("notables", ".ods")
    val z2 = new java.util.zip.ZipOutputStream(Files.newOutputStream(noTables))
    z2.putNextEntry(new java.util.zip.ZipEntry("content.xml"))
    z2.write("""<office:document-content xmlns:office="u"><office:body/></office:document-content>""".getBytes)
    z2.closeEntry(); z2.close()
    val e2 = intercept[graft.detect.CsvSniffer.ParseException] {
      OdsReader.read(noTables.toString)
    }
    assert(e2.getMessage.startsWith("ods-inspection:"))
  }

  test("empty xls fails with the parse-error contract, not a crash") {
    val f = Files.createTempFile("bad", ".xls")
    Files.write(f, Array.fill(600)(0x00.toByte))
    val e = intercept[graft.detect.CsvSniffer.ParseException] {
      XlsReader.read(f.toString)
    }
    assert(e.getMessage.startsWith("xls-inspection:"))
  }
}
