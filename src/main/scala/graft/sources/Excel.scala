package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import scala.collection.mutable

/** Self-contained XLSX parsing — no POI, no external jars. An .xlsx file is
  * a zip of XML parts (ECMA-376 SpreadsheetML); the subset a data pipeline
  * needs — sheet catalog, shared strings, cell values — parses with the
  * JDK's own StAX reader. Values are extracted as raw strings (the staging
  * contract: typing happens downstream, same as the CSV path).
  *
  * Reference surface replaced: `readxl::read_excel(path, sheet, skip, na)`
  * and `pandas.read_excel` calls throughout scripts/ (e.g.
  * scripts/wait-times/build_datasets_wait_times.R:65-70,250,285,332;
  * scripts/build_datasets_main.py:20-60).
  */
object Excel {

  /** Parsed workbook: sheet (name → part path) in workbook order, the
    * shared-string table, the set of cell-style indices whose number format
    * renders as a date (for serial→date rendering, readxl-style), and the
    * workbook's date system (1900 vs 1904 epoch).
    */
  final case class Workbook(sheets: Seq[(String, String)],
                            parts: Map[String, Array[Byte]],
                            shared: IndexedSeq[String],
                            dateStyles: Set[Int] = Set.empty,
                            date1904: Boolean = false) {
    def sheetNames: Seq[String] = sheets.map(_._1)

    /** First sheet whose name matches the regex (the reference selects the
      * provider sheet with `^providers?$` case-insensitively).
      */
    def sheetByName(nameRegex: String): Option[String] = {
      val re = ("(?i)" + nameRegex).r
      sheets.collectFirst { case (n, p) if re.findFirstIn(n).isDefined => p }
    }

    def sheetByIndex(i: Int): Option[String] =
      sheets.lift(i).map(_._2)
  }

  private val xif = {
    val f = XMLInputFactory.newInstance()
    // hardening: never resolve external entities from untrusted workbooks
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** Unzip the parts a reader needs (worksheets, workbook, rels, shared
    * strings); everything else (styles, themes, media) is skipped unread.
    */
  def open(bytes: Array[Byte]): Workbook = {
    val parts = mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/workbook.xml" || name == "xl/_rels/workbook.xml.rels" ||
            name == "xl/sharedStrings.xml" || name == "xl/styles.xml" ||
            name.startsWith("xl/worksheets/")) {
          parts(name) = zin.readAllBytes()
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()

    val rels: Map[String, String] = parts.get("xl/_rels/workbook.xml.rels").map { b =>
      val r = xif.createXMLStreamReader(new ByteArrayInputStream(b))
      val m = mutable.Map.empty[String, String]
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val target = r.getAttributeValue(null, "Target")
          if (id != null && target != null)
            m(id) = if (target.startsWith("/")) target.stripPrefix("/")
            else "xl/" + target.stripPrefix("./")
        }
      }
      m.toMap
    }.getOrElse(Map.empty)

    var date1904 = false
    val sheets: Seq[(String, String)] = parts.get("xl/workbook.xml").map { b =>
      val r = xif.createXMLStreamReader(new ByteArrayInputStream(b))
      val out = mutable.ArrayBuffer.empty[(String, String)]
      var fallbackIdx = 0
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT) r.getLocalName match {
          case "sheet" =>
            val name = r.getAttributeValue(null, "name")
            val rid = (0 until r.getAttributeCount)
              .find(i => r.getAttributeLocalName(i) == "id")
              .map(r.getAttributeValue)
            fallbackIdx += 1
            val path = rid.flatMap(rels.get)
              .getOrElse(s"xl/worksheets/sheet$fallbackIdx.xml")
            out += ((name, path))
          case "workbookPr" =>
            val v = r.getAttributeValue(null, "date1904")
            date1904 = v == "1" || v == "true"
          case _ => ()
        }
      }
      out.toSeq
    }.getOrElse(Seq.empty)

    val shared: IndexedSeq[String] = parts.get("xl/sharedStrings.xml").map { b =>
      val r = xif.createXMLStreamReader(new ByteArrayInputStream(b))
      val out = mutable.ArrayBuffer.empty[String]
      val cur = new java.lang.StringBuilder
      var inSi = false
      var inT = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.setLength(0)
              case "t" if inSi => inT = true
              case _ => ()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA if inT =>
            cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; out += cur.toString
              case _ => ()
            }
          case _ => ()
        }
      }
      out.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

    // Date-format detection from xl/styles.xml: a cell's `s` attribute
    // indexes cellXfs; each xf carries a numFmtId — builtin date ids or a
    // custom formatCode with date tokens mark the style as date-rendered.
    val dateStyles: Set[Int] = parts.get("xl/styles.xml").map { b =>
      val r = xif.createXMLStreamReader(new ByteArrayInputStream(b))
      val customDate = mutable.Set.empty[Int]
      val xfFmts = mutable.ArrayBuffer.empty[Int]
      var inCellXfs = false
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "numFmt" =>
              val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
              val code = r.getAttributeValue(null, "formatCode")
              if (id.isDefined && code != null && isDateFormatCode(code))
                customDate += id.get
            case "cellXfs" => inCellXfs = true
            case "xf" if inCellXfs =>
              xfFmts += Option(r.getAttributeValue(null, "numFmtId"))
                .map(_.toInt).getOrElse(0)
            case _ => ()
          }
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "cellXfs" =>
            inCellXfs = false
          case _ => ()
        }
      }
      xfFmts.zipWithIndex.collect {
        case (fmt, i) if BuiltinDateFmts(fmt) || customDate(fmt) => i
      }.toSet
    }.getOrElse(Set.empty)

    Workbook(sheets, parts.toMap, shared, dateStyles, date1904)
  }

  /** ECMA-376 builtin number formats that render as dates/datetimes (the
    * ids are shared by BIFF8, so [[Xls]] reuses this table).
    */
  private[sources] val BuiltinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** A custom format code is a date format if, outside quoted literals,
    * `[...]` sections (colors/locales) and escaped characters, it contains a
    * y/m/d/h/s token — the same heuristic every spreadsheet reader applies.
    */
  private[sources] def isDateFormatCode(code: String): Boolean = {
    val sb = new java.lang.StringBuilder
    var i = 0
    var inQuote = false
    var inBracket = false
    while (i < code.length) {
      val c = code.charAt(i)
      if (inQuote) { if (c == '"') inQuote = false }
      else if (inBracket) { if (c == ']') inBracket = false }
      else c match {
        case '"' => inQuote = true
        case '[' => inBracket = true
        case '\\' => i += 1 // escaped literal: skip next char
        case _ => sb.append(c)
      }
      i += 1
    }
    val body = sb.toString.toLowerCase
    body.exists(Set('y', 'm', 'd', 'h', 's').contains) && body != "general"
  }

  /** Excel serial → readxl-style rendering. 1900 system: epoch 1899-12-30
    * (the standard offset; like readxl, serials in Jan-Feb 1900 inherit the
    * Lotus leap-year bug). 1904 system: epoch 1904-01-01. A fractional part
    * renders as a datetime, a whole serial as a plain date.
    */
  private[sources] def serialToDateString(serial: Double, date1904: Boolean): String = {
    val epoch = if (date1904) java.time.LocalDate.of(1904, 1, 1)
      else java.time.LocalDate.of(1899, 12, 30)
    val days = math.floor(serial).toLong
    val date = epoch.plusDays(days)
    val secs = math.round((serial - days) * 86400d)
    if (secs == 0L) date.toString
    else if (secs >= 86400L) date.plusDays(1).toString // rounding carried over
    else f"$date ${secs / 3600}%02d:${secs / 60 % 60}%02d:${secs % 60}%02d"
  }

  /** Column index of an A1-style reference ("BC23" → 54). */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** Cell grid of one worksheet part: rows of nullable strings, padded to
    * the widest row. Handles shared strings (t="s"), inline strings
    * (t="inlineStr"), formula strings (t="str"), booleans (t="b" →
    * "TRUE"/"FALSE" like readxl), and raw numeric text (default). When
    * `renderDates` is on (the default, matching readxl), numeric cells whose
    * style carries a date number format render as ISO date / datetime
    * strings via [[serialToDateString]] under the workbook's 1900/1904
    * system; off, they surface as raw serial strings.
    */
  def sheetGrid(wb: Workbook, partPath: String,
                renderDates: Boolean = true): Vector[Array[String]] = {
    val bytes = wb.parts.getOrElse(partPath,
      throw new IllegalArgumentException(s"no worksheet part $partPath"))
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(bytes))
    val rows = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[(Int, String)]]
    var currentRow: mutable.ArrayBuffer[(Int, String)] = null
    var cellType = "n"
    var cellDateStyle = false
    var cellCol = -1
    var nextCol = 0
    var inV = false
    var inIsT = false
    val text = new java.lang.StringBuilder
    var maxCol = -1

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              currentRow = mutable.ArrayBuffer.empty
              nextCol = 0
            case "c" if currentRow != null =>
              val ref = r.getAttributeValue(null, "r")
              cellCol = if (ref != null) colIndex(ref) else nextCol
              nextCol = cellCol + 1
              val t = r.getAttributeValue(null, "t")
              cellType = if (t == null) "n" else t
              cellDateStyle = {
                // malformed style attr degrades to non-date rendering,
                // matching the defensive toDoubleOption on the value
                val s = r.getAttributeValue(null, "s")
                s != null && s.trim.toIntOption.exists(wb.dateStyles)
              }
              text.setLength(0)
            case "v" => inV = true
            case "t" => inIsT = true // only meaningful inside <is>
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inV || (inIsT && cellType == "inlineStr")) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" if currentRow != null && cellCol >= 0 =>
              val raw = text.toString
              val value = cellType match {
                case "s" =>
                  val idx = raw.trim.toInt
                  if (idx >= 0 && idx < wb.shared.length) wb.shared(idx) else null
                case "b" => if (raw.trim == "1") "TRUE" else "FALSE"
                case "n" if renderDates && cellDateStyle && raw.nonEmpty =>
                  raw.trim.toDoubleOption
                    .map(serialToDateString(_, wb.date1904))
                    .getOrElse(raw)
                case _ => if (raw.isEmpty) null else raw
              }
              if (value != null) {
                currentRow += ((cellCol, value))
                if (cellCol > maxCol) maxCol = cellCol
              }
              cellCol = -1
            case "row" =>
              if (currentRow != null) rows += currentRow
              currentRow = null
            case _ => ()
          }
        case _ => ()
      }
    }

    val width = maxCol + 1
    rows.map { cells =>
      val arr = new Array[String](width)
      cells.foreach { case (c, v) => if (c < width) arr(c) = v }
      arr
    }.toVector
  }
}
