package graft.detect

import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

/** A4 — minimal ODS sheet reader (reference utils/reader.py:60-66 reads ods
  * through pandas' odf engine). ODS is ZIP + OpenDocument content.xml —
  * JDK-only, same StAX approach as XlsxReader.
  *
  * Cell values resolve the OpenDocument way: typed cells (float, date, time,
  * boolean, percentage, currency) carry their canonical value in
  * office:value-ish attributes; strings come from the nested text:p runs.
  * `table:number-columns-repeated` expands (bounded, so a trailing
  * repeated-empty run of 16k columns doesn't materialize). */
object OdsReader {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  final case class Sheet(name: String, rows: Vector[Vector[String]])

  def read(path: String, sheetName: Option[String] = None): Sheet = {
    val zip = new ZipFile(path)
    try {
      val entry = zip.getEntry("content.xml")
      if (entry == null)
        throw new CsvSniffer.ParseException("ods-inspection", "missing content.xml")
      readContent(zip, entry, sheetName)
    } finally zip.close()
  }

  private def fmtNumber(s: String): String = {
    val v = try s.toDouble catch { case _: NumberFormatException => return s }
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else s
  }

  private def readContent(zip: ZipFile, entry: java.util.zip.ZipEntry,
      sheetName: Option[String]): Sheet = {
    val r = factory.createXMLStreamReader(zip.getInputStream(entry))
    val tables = mutable.ArrayBuffer.empty[(String, Vector[Vector[String]])]

    var rows: mutable.ArrayBuffer[Vector[String]] = null
    var row: mutable.ArrayBuffer[String] = null
    var tableName = ""
    // current cell state
    var cellRepeat = 1
    var typedValue: Option[String] = None
    var inCell = false
    var inP = false        // inside an open text:p run (captures characters)
    var sawP = false       // a paragraph already closed in this cell (join with \n)
    // empty-cell runs are buffered, not materialized: mid-row runs flush
    // before the next non-empty value (alignment preserved), a trailing run
    // — LibreOffice's 16k-column filler — simply never flushes
    var pendingEmpties = 0
    val text = new StringBuilder

    def attr(local: String): Option[String] =
      (0 until r.getAttributeCount)
        .find(i => r.getAttributeLocalName(i) == local)
        .map(r.getAttributeValue)

    def flushCell(): Unit = {
      val v = typedValue.getOrElse(text.result())
      val reps = math.min(cellRepeat, 16384)
      if (v.isEmpty) pendingEmpties += reps
      else {
        for (_ <- 0 until pendingEmpties) row += ""
        pendingEmpties = 0
        for (_ <- 0 until reps) row += v
      }
      typedValue = None; text.clear(); inCell = false; inP = false; sawP = false
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "table" =>
              tableName = attr("name").getOrElse(s"Sheet${tables.length + 1}")
              rows = mutable.ArrayBuffer.empty
            case "table-row" if rows != null =>
              row = mutable.ArrayBuffer.empty
              pendingEmpties = 0
            case "table-cell" | "covered-table-cell" if row != null =>
              inCell = true
              cellRepeat = attr("number-columns-repeated").flatMap(_.toIntOption).getOrElse(1)
              val vt = attr("value-type").getOrElse("")
              typedValue = vt match {
                case "float" | "percentage" | "currency" => attr("value").map(fmtNumber)
                case "date" => attr("date-value").map(_.replace("T", " "))
                case "time" => attr("time-value")
                case "boolean" => attr("boolean-value")
                case _ => None
              }
            case "p" if inCell =>
              if (sawP) text += '\n'
              inP = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inCell && inP =>
          // only inside an open text:p — inter-paragraph indentation from
          // pretty-printed content.xml must not leak into the value
          text ++= r.getText
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "table-cell" | "covered-table-cell" if inCell => flushCell()
            case "p" if inCell => inP = false; sawP = true
            case "table-row" if row != null =>
              // drop trailing empties so width reflects content
              val v = row.toVector.reverse.dropWhile(_.isEmpty).reverse
              rows += v
              row = null; inP = false; sawP = false
            case "table" if rows != null =>
              val trimmed = rows.toVector.reverse.dropWhile(_.isEmpty).reverse
              val width = if (trimmed.isEmpty) 0 else trimmed.map(_.length).max
              tables += ((tableName, trimmed.map(v => v ++ Vector.fill(width - v.length)(""))))
              rows = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    if (tables.isEmpty)
      throw new CsvSniffer.ParseException("ods-inspection", "list index out of range")
    val (name, data) = sheetName.flatMap(n => tables.find(_._1 == n)).getOrElse(tables.head)
    Sheet(name, data)
  }
}
