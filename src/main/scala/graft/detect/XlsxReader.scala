package graft.detect

import java.io.InputStream
import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

/** A4 — minimal XLSX sheet reader (SURVEY §2-A4 was a "gap": no POI jar
  * offline; but XLSX is just ZIP + OOXML SpreadsheetML, both readable with
  * the JDK alone — java.util.zip + StAX).
  *
  * Scope matches what the reference actually consumes through openpyxl
  * (utils/reader.py:30-41): cell VALUES as strings, first (or named) sheet,
  * same header-skip contract; the engine's own TypeInference re-infers the
  * column types downstream exactly as it does for CSV. Style-based date
  * formatting (Excel serial dates) is not decoded — documented limitation.
  *
  * Driver-side parse is the right call here: the reference caps xlsx at
  * 12.5 MB (config_default.toml:55), so a sheet always fits on the driver,
  * mirroring openpyxl's behavior; the resulting rows immediately become a
  * distributed DataFrame for inference/casting.
  */
object XlsxReader {

  private val factory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  final case class Sheet(name: String, rows: Vector[Vector[String]])

  /** Read one worksheet (first by default, or by name). */
  def read(path: String, sheetName: Option[String] = None): Sheet = {
    val zip = new ZipFile(path)
    try {
      val shared = readSharedStrings(zip)
      val dateStyles = readDateStyles(zip)
      val sheets = sheetTargets(zip)
      if (sheets.isEmpty)
        throw new CsvSniffer.ParseException("xlsx-inspection", "list index out of range")
      val (name, target) = sheetName
        .flatMap(n => sheets.find(_._1 == n))
        .getOrElse(sheets.head)
      val entry = zip.getEntry(target)
      if (entry == null)
        throw new CsvSniffer.ParseException("xlsx-inspection", s"missing $target")
      Sheet(name, readSheet(zip.getInputStream(entry), shared, dateStyles))
    } finally zip.close()
  }

  /** styles.xml: which cellXf style indexes render as dates/times, and
    * whether they carry time — shares the builtin-id set and custom-format
    * heuristic with the BIFF reader (XlsReader.isDateFormat). */
  private def readDateStyles(zip: ZipFile): Map[Int, Boolean] = {
    val e = zip.getEntry("xl/styles.xml")
    if (e == null) return Map.empty
    val r = factory.createXMLStreamReader(zip.getInputStream(e))
    val customFmts = mutable.Map.empty[Int, String]
    val cellXfFmts = mutable.ArrayBuffer.empty[Int]
    var inCellXfs = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            for {
              id <- Option(r.getAttributeValue(null, "numFmtId")).flatMap(_.toIntOption)
              code <- Option(r.getAttributeValue(null, "formatCode"))
            } customFmts(id) = code
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            cellXfFmts += Option(r.getAttributeValue(null, "numFmtId"))
              .flatMap(_.toIntOption).getOrElse(0)
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
          inCellXfs = false
        case _ =>
      }
    }
    r.close()
    cellXfFmts.zipWithIndex.collect {
      case (fmt, i) if XlsReader.isDateFormat(fmt, customFmts.toMap) =>
        val code = customFmts.getOrElse(fmt, "")
        val hasTime = code.exists(c => "hsHS".indexOf(c) >= 0) ||
          (18 to 22).contains(fmt) || (32 to 36).contains(fmt) || (45 to 47).contains(fmt)
        i -> hasTime
    }.toMap
  }

  private def readSharedStrings(zip: ZipFile): Vector[String] = {
    val e = zip.getEntry("xl/sharedStrings.xml")
    if (e == null) return Vector.empty
    val out = Vector.newBuilder[String]
    val r = factory.createXMLStreamReader(zip.getInputStream(e))
    var inSi = false
    val cur = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          inSi = true; cur.clear()
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          inSi = false; out += cur.result()
        case XMLStreamConstants.START_ELEMENT if inSi && r.getLocalName == "t" =>
          cur ++= r.getElementText
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** workbook.xml sheet order + relationship targets. */
  private def sheetTargets(zip: ZipFile): Seq[(String, String)] = {
    val rels: Map[String, String] = {
      val e = zip.getEntry("xl/_rels/workbook.xml.rels")
      if (e == null) Map.empty
      else {
        val r = factory.createXMLStreamReader(zip.getInputStream(e))
        val m = mutable.Map.empty[String, String]
        while (r.hasNext) {
          if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
            val id = r.getAttributeValue(null, "Id")
            val tgt = r.getAttributeValue(null, "Target")
            if (id != null && tgt != null)
              m(id) = if (tgt.startsWith("/")) tgt.stripPrefix("/") else s"xl/$tgt"
          }
        }
        r.close()
        m.toMap
      }
    }
    val e = zip.getEntry("xl/workbook.xml")
    if (e == null) return Seq.empty
    val r = factory.createXMLStreamReader(zip.getInputStream(e))
    val out = Seq.newBuilder[(String, String)]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        val name = r.getAttributeValue(null, "name")
        val rid = (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == "id")
          .map(r.getAttributeValue)
        rid.flatMap(rels.get).foreach(t => out += ((name, t)))
      }
    }
    r.close()
    out.result()
  }

  /** Stream one worksheet's cells into dense string rows (gaps → ""). */
  private def readSheet(in: InputStream, shared: Vector[String],
      dateStyles: Map[Int, Boolean]): Vector[Vector[String]] = {
    val r = factory.createXMLStreamReader(in)
    val rows = Vector.newBuilder[Vector[String]]
    var row: mutable.ArrayBuffer[String] = null
    var cellType = ""
    var cellStyle = -1
    var cellCol = -1
    var inV = false
    var inInlineT = false
    var value = new StringBuilder
    var maxWidth = 0

    def colIndex(ref: String): Int = {
      var i = 0; var acc = 0
      while (i < ref.length && ref.charAt(i).isLetter) {
        acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
      }
      math.max(acc - 1, 0)
    }
    def pad(buf: mutable.ArrayBuffer[String], upto: Int): Unit =
      while (buf.length <= upto) buf += ""

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer.empty[String]
            case "c" =>
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cellStyle = Option(r.getAttributeValue(null, "s"))
                .flatMap(_.toIntOption).getOrElse(-1)
              cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex).getOrElse(
                if (row == null) 0 else row.length)
            case "v" => inV = true; value = new StringBuilder
            case "t" if cellType == "inlineStr" => inInlineT = true; value = new StringBuilder
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS =>
          if (inV || inInlineT) value ++= r.getText
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" if inV || inInlineT =>
              val raw = value.result()
              val resolved = cellType match {
                case "s" => shared.lift(raw.trim.toInt).getOrElse("")
                case "b" => if (raw.trim == "1") "true" else "false"
                case "" | "n" if dateStyles.contains(cellStyle) =>
                  // Excel serial under a date style → ISO (shared with BIFF)
                  raw.trim.toDoubleOption match {
                    case Some(serial) =>
                      XlsReader.serialToIso(serial, dateStyles(cellStyle))
                    case None => raw
                  }
                case _ => raw
              }
              if (row != null) { pad(row, cellCol); row(cellCol) = resolved }
              inV = false; inInlineT = false
            case "row" =>
              val vec = row.toVector
              maxWidth = math.max(maxWidth, vec.length)
              rows += vec
              row = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    // right-pad every row to the sheet width so downstream sees a rectangle
    rows.result().map(v => v ++ Vector.fill(maxWidth - v.length)(""))
  }
}
