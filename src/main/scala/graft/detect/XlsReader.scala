package graft.detect

import java.nio.file.{Files, Paths}

import scala.collection.mutable

/** A4 — minimal legacy .xls reader (reference utils/reader.py:60-66 routes
  * xls through xlrd; no such jar offline, but the container and record
  * formats are public specs — MS-CFB compound files and MS-XLS BIFF8 — and a
  * driver-side parse is bounded by the 50 MB xls size cap the same way the
  * xlsx path is).
  *
  * Scope: the record set a tabular export actually uses — SST/LABELSST,
  * LABEL, NUMBER/RK/MULRK, BOOLERR, FORMULA cached values, BOUNDSHEET for
  * sheet selection — plus FORMAT/XF so Excel serial date/time numbers decode
  * to ISO strings (TypeInference then re-infers them as date/datetime
  * downstream, the same contract as CSV text).
  *
  * The compound-file layer handles the full small-file reality: FAT chains,
  * DIFAT continuation, and the mini-stream (streams under 4096 bytes live in
  * 64-byte mini sectors inside the root entry's stream — which is where the
  * Workbook stream of every small real-world file sits). */
object XlsReader {

  final case class Sheet(name: String, rows: Vector[Vector[String]])

  def read(path: String, sheetName: Option[String] = None): Sheet = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val wb = workbookStream(bytes)
    parseWorkbook(wb, sheetName)
  }

  // ---- OLE2 / MS-CFB container ------------------------------------------

  private val Magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
  private val EndOfChain = 0xFFFFFFFE
  private val FreeSect = 0xFFFFFFFF

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def fail(msg: String): Nothing =
    throw new CsvSniffer.ParseException("xls-inspection", msg)

  /** Extract the Workbook (or Book) stream out of the compound file. */
  private[graft] def workbookStream(b: Array[Byte]): Array[Byte] = {
    if (b.length < 512 || !b.take(8).sameElements(Magic)) fail("not an OLE2 compound file")
    val sectorSize = 1 << le16(b, 30)
    val miniSize = 1 << le16(b, 32)
    val dirStart = le32(b, 48)
    val miniCutoff = le32(b, 56)
    val miniFatStart = le32(b, 60)
    val difatStart = le32(b, 68)
    val numDifat = le32(b, 72)

    def sectorAt(i: Int): Int = 512 + i * sectorSize

    // FAT sector list: 109 header DIFAT slots + DIFAT continuation sectors
    val fatSectors = mutable.ArrayBuffer.empty[Int]
    for (i <- 0 until 109) {
      val s = le32(b, 76 + i * 4)
      if (s != FreeSect && s >= 0) fatSectors += s
    }
    var difat = difatStart
    var difatSeen = 0
    while (difat != EndOfChain && difat != FreeSect && difatSeen < numDifat + 1) {
      val base = sectorAt(difat)
      for (i <- 0 until (sectorSize / 4 - 1)) {
        val s = le32(b, base + i * 4)
        if (s != FreeSect && s >= 0) fatSectors += s
      }
      difat = le32(b, base + sectorSize - 4)
      difatSeen += 1
    }

    val entriesPerFat = sectorSize / 4
    def fatEntry(sector: Int): Int = {
      val fs = fatSectors(sector / entriesPerFat)
      le32(b, sectorAt(fs) + (sector % entriesPerFat) * 4)
    }

    def readChain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var hops = 0
      while (s != EndOfChain && s != FreeSect && s >= 0) {
        if (hops > b.length / sectorSize + 2) fail("FAT chain loop")
        out.write(b, sectorAt(s), math.min(sectorSize, b.length - sectorAt(s)))
        s = fatEntry(s)
        hops += 1
      }
      out.toByteArray
    }

    // directory entries (128 bytes each) from the directory chain
    val dir = readChain(dirStart)
    final case class Entry(name: String, entryType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val off = i * 128
      val nameLen = le16(dir, off + 64) // bytes incl. terminator
      val name = if (nameLen >= 2)
        new String(dir, off, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else ""
      Entry(name, dir(off + 66) & 0xFF, le32(dir, off + 116),
        le32(dir, off + 120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.find(_.entryType == 5).getOrElse(fail("no root entry"))
    val wb = entries.find(e => e.entryType == 2 && (e.name == "Workbook" || e.name == "Book"))
      .getOrElse(fail("no Workbook stream"))

    val stream: Array[Byte] =
      if (wb.size >= miniCutoff) readChain(wb.start)
      else {
        // mini-stream: 64-byte sectors inside the root entry's big chain,
        // chained through the separate mini FAT
        val miniStream = readChain(root.start)
        val miniFat = readChain(miniFatStart)
        val out = new java.io.ByteArrayOutputStream()
        var s = wb.start
        var hops = 0
        while (s != EndOfChain && s != FreeSect && s >= 0) {
          if (hops > miniStream.length / miniSize + 2) fail("miniFAT chain loop")
          out.write(miniStream, s * miniSize,
            math.min(miniSize, miniStream.length - s * miniSize))
          s = le32(miniFat, s * 4)
          hops += 1
        }
        out.toByteArray
      }
    java.util.Arrays.copyOf(stream, math.min(stream.length, wb.size).toInt)
  }

  // ---- BIFF8 records -----------------------------------------------------

  private final case class Record(typ: Int, data: Array[Byte], offset: Int)

  private def records(b: Array[Byte], from: Int = 0): Iterator[Record] =
    new Iterator[Record] {
      private var pos = from
      def hasNext: Boolean = pos + 4 <= b.length && {
        val t = le16(b, pos); val l = le16(b, pos + 2)
        !(t == 0 && l == 0) && pos + 4 + l <= b.length
      }
      def next(): Record = {
        val t = le16(b, pos); val l = le16(b, pos + 2)
        val r = Record(t, java.util.Arrays.copyOfRange(b, pos + 4, pos + 4 + l), pos)
        pos += 4 + l
        r
      }
    }

  /** BIFF8 unicode string at data(off): 16-bit length form. Returns
    * (string, bytesConsumed). Rich-text/phonetic extensions are skipped. */
  private def unicodeString16(d: Array[Byte], off: Int): (String, Int) = {
    val n = le16(d, off)
    val grbit = d(off + 2) & 0xFF
    var p = off + 3
    val richRuns = if ((grbit & 0x08) != 0) { val r = le16(d, p); p += 2; r } else 0
    val phonetic = if ((grbit & 0x04) != 0) { val s = le32(d, p); p += 4; s } else 0
    val s = if ((grbit & 0x01) != 0) {
      val str = new String(d, p, n * 2, java.nio.charset.StandardCharsets.UTF_16LE)
      p += n * 2; str
    } else {
      val str = new String(d, p, n, java.nio.charset.StandardCharsets.ISO_8859_1)
      p += n; str
    }
    p += richRuns * 4 + phonetic
    (s, p - off)
  }

  /** Short (8-bit length) unicode string — BOUNDSHEET names. */
  private def unicodeString8(d: Array[Byte], off: Int): String = {
    val n = d(off) & 0xFF
    val grbit = d(off + 1) & 0xFF
    if ((grbit & 0x01) != 0)
      new String(d, off + 2, n * 2, java.nio.charset.StandardCharsets.UTF_16LE)
    else new String(d, off + 2, n, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def rkValue(rk: Int): Double = {
    val div100 = (rk & 1) != 0
    val isInt = (rk & 2) != 0
    val v =
      if (isInt) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk.toLong & 0xFFFFFFFCL) << 32)
    if (div100) v / 100.0 else v
  }

  /** SST with CONTINUE records: each continuation restarts with a fresh
    * option byte for the string being carried over. */
  private def parseSst(first: Record, conts: Seq[Record]): Vector[String] = {
    val out = Vector.newBuilder[String]
    val unique = le32(first.data, 4)
    val blocks = (first.data.drop(8)) +: conts.map(_.data)
    var bi = 0
    var p = 0
    var count = 0
    var carryChars = 0     // chars still to read for the current string
    val cur = new StringBuilder

    def block = blocks(bi)
    def avail = block.length - p
    def advanceBlock(): Unit = { bi += 1; p = 0 }

    while (count < unique && bi < blocks.length) {
      if (carryChars == 0) {
        if (avail < 3) { advanceBlock() }
        else {
          val n = le16(block, p)
          var grbit = block(p + 2) & 0xFF
          p += 3
          var richRuns = 0; var phonetic = 0
          if ((grbit & 0x08) != 0) { richRuns = le16(block, p); p += 2 }
          if ((grbit & 0x04) != 0) { phonetic = le32(block, p); p += 4 }
          cur.clear()
          carryChars = n
          // read as much of the string as this block holds
          var wide = (grbit & 0x01) != 0
          while (carryChars > 0 && bi < blocks.length) {
            if (avail == 0) {
              advanceBlock()
              if (bi < blocks.length) { wide = (block(p) & 1) != 0; p += 1 }
            } else {
              val take = math.min(carryChars, if (wide) avail / 2 else avail)
              if (take == 0) { advanceBlock(); if (bi < blocks.length) { wide = (block(p) & 1) != 0; p += 1 } }
              else {
                if (wide) {
                  cur ++= new String(block, p, take * 2, java.nio.charset.StandardCharsets.UTF_16LE)
                  p += take * 2
                } else {
                  cur ++= new String(block, p, take, java.nio.charset.StandardCharsets.ISO_8859_1)
                  p += take
                }
                carryChars -= take
              }
            }
          }
          // rich-run/phonetic extension bytes may spill into following
          // CONTINUE records (which then carry NO option byte) — consume
          // across block boundaries instead of assuming one block
          var ext = richRuns * 4 + phonetic
          while (ext > 0 && bi < blocks.length) {
            if (avail <= 0) advanceBlock()
            else { val take = math.min(ext, avail); p += take; ext -= take }
          }
          out += cur.result()
          count += 1
        }
      }
    }
    out.result()
  }

  // ---- date/number formatting -------------------------------------------

  /** Builtin BIFF format ids that render as dates/times (MS-XLS 2.4.126). */
  private val builtinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  private[graft] def isDateFormat(fmtId: Int, custom: Map[Int, String]): Boolean =
    builtinDateFmts.contains(fmtId) || custom.get(fmtId).exists { f =>
      // strip quoted literals, [] sections and color codes, then look for
      // date/time tokens — the xlrd heuristic
      val cleaned = f.replaceAll("\"[^\"]*\"", "").replaceAll("\\[[^\\]]*\\]", "")
      !cleaned.equalsIgnoreCase("general") && cleaned.exists(c => "ymdhsYMDHS".indexOf(c) >= 0)
    }

  private val excelEpoch = java.time.LocalDate.of(1899, 12, 30)

  /** Excel 1900-system serial → ISO date/datetime string (phantom 1900-02-29
    * handled the xlrd way: serials below 60 shift by one day). */
  private[graft] def serialToIso(serial: Double, withTime: Boolean): String = {
    val days = math.floor(serial).toLong
    val frac = serial - days
    val base = if (days < 60) excelEpoch.plusDays(1) else excelEpoch
    val date = base.plusDays(days)
    if (!withTime && frac == 0.0) date.toString
    else {
      val secs = math.round(frac * 86400.0)
      val t = java.time.LocalTime.ofSecondOfDay(math.min(secs, 86399L))
      f"$date ${t.getHour}%02d:${t.getMinute}%02d:${t.getSecond}%02d"
    }
  }

  private def fmtNumber(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  // ---- workbook assembly -------------------------------------------------

  private def parseWorkbook(wb: Array[Byte], sheetName: Option[String]): Sheet = {
    // globals pass: SST, FORMAT, XF, BOUNDSHEET
    var sst = Vector.empty[String]
    val customFmts = mutable.Map.empty[Int, String]
    val xfFormats = mutable.ArrayBuffer.empty[Int]
    val sheets = mutable.ArrayBuffer.empty[(String, Int)]

    val globals = records(wb).toVector
    var i = 0
    while (i < globals.length) {
      val r = globals(i)
      r.typ match {
        case 0xFC => // SST (+ CONTINUEs)
          val conts = globals.drop(i + 1).takeWhile(_.typ == 0x3C)
          sst = parseSst(r, conts)
          i += conts.length
        case 0x85 =>
          sheets += ((unicodeString8(r.data, 6), le32(r.data, 0)))
        case 0x41E =>
          val id = le16(r.data, 0)
          customFmts(id) = unicodeString16(r.data, 2)._1
        case 0xE0 =>
          xfFormats += le16(r.data, 2)
        case 0x0A => i = globals.length // EOF of globals substream
        case _ =>
      }
      i += 1
    }
    if (sheets.isEmpty) fail("no sheets")
    val (name, offset) = sheetName.flatMap(n => sheets.find(_._1 == n)).getOrElse(sheets.head)

    def cellDateFmt(xf: Int): Boolean =
      xfFormats.lift(xf).exists(f => isDateFormat(f, customFmts.toMap))
    def renderNum(v: Double, xf: Int): String =
      if (cellDateFmt(xf)) {
        val fmtStr = xfFormats.lift(xf).map(id =>
          customFmts.getOrElse(id, builtinTimeHint(id))).getOrElse("")
        val hasTime = fmtStr.exists(c => "hsHS".indexOf(c) >= 0) || v != math.floor(v)
        serialToIso(v, hasTime)
      } else fmtNumber(v)

    // worksheet substream
    val cells = mutable.Map.empty[(Int, Int), String]
    var maxRow = -1; var maxCol = -1
    def put(row: Int, colIdx: Int, v: String): Unit = {
      cells((row, colIdx)) = v
      if (row > maxRow) maxRow = row
      if (colIdx > maxCol) maxCol = colIdx
    }

    val it = records(wb, offset)
    var depth = 0
    var done = false
    var pendingFormulaCell: Option[(Int, Int)] = None
    while (it.hasNext && !done) {
      val r = it.next()
      r.typ match {
        case 0x809 => depth += 1
        case 0x0A => depth -= 1; if (depth <= 0) done = true
        case 0xFD => // LABELSST
          put(le16(r.data, 0), le16(r.data, 2),
            sst.lift(le32(r.data, 6)).getOrElse(""))
        case 0x204 => // LABEL
          put(le16(r.data, 0), le16(r.data, 2), unicodeString16(r.data, 6)._1)
        case 0x203 => // NUMBER
          val v = java.lang.Double.longBitsToDouble(
            java.nio.ByteBuffer.wrap(r.data, 6, 8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
          put(le16(r.data, 0), le16(r.data, 2), renderNum(v, le16(r.data, 4)))
        case 0x27E => // RK
          put(le16(r.data, 0), le16(r.data, 2),
            renderNum(rkValue(le32(r.data, 6)), le16(r.data, 4)))
        case 0xBD => // MULRK
          val row = le16(r.data, 0); val first = le16(r.data, 2)
          val n = (r.data.length - 6) / 6
          for (k <- 0 until n)
            put(row, first + k,
              renderNum(rkValue(le32(r.data, 6 + k * 6)), le16(r.data, 4 + k * 6)))
        case 0x205 => // BOOLERR
          val isErr = (r.data(7) & 0xFF) != 0
          put(le16(r.data, 0), le16(r.data, 2),
            if (isErr) "" else if (r.data(6) != 0) "true" else "false")
        case 0x06 => // FORMULA: cached value; 0xFFFF-tagged specials
          val row = le16(r.data, 0); val colIdx = le16(r.data, 2); val xf = le16(r.data, 4)
          if (le16(r.data, 12) == 0xFFFF) {
            (r.data(6) & 0xFF) match {
              case 0 => pendingFormulaCell = Some((row, colIdx)) // string follows
              case 1 => put(row, colIdx, if (r.data(8) != 0) "true" else "false")
              case _ => put(row, colIdx, "")
            }
          } else {
            val v = java.lang.Double.longBitsToDouble(
              java.nio.ByteBuffer.wrap(r.data, 6, 8)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
            put(row, colIdx, renderNum(v, xf))
          }
        case 0x207 => // STRING (cached formula string)
          pendingFormulaCell.foreach { case (row, colIdx) =>
            put(row, colIdx, unicodeString16(r.data, 0)._1)
          }
          pendingFormulaCell = None
        case _ =>
      }
    }
    if (maxRow < 0) return Sheet(name, Vector.empty)
    val rows = (0 to maxRow).map { r =>
      (0 to maxCol).map(c => cells.getOrElse((r, c), "")).toVector
    }.toVector
    Sheet(name, rows)
  }

  /** For builtin date formats without a custom string: do they carry time? */
  private def builtinTimeHint(id: Int): String =
    if ((18 to 22).contains(id) || (32 to 36).contains(id) || (45 to 47).contains(id)) "hs"
    else "ymd"
}
