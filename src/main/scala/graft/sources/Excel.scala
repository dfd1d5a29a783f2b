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

  /** Parsed workbook: sheet (name → part path) in workbook order, plus the
    * shared-string table.
    */
  final case class Workbook(sheets: Seq[(String, String)],
                            parts: Map[String, Array[Byte]],
                            shared: IndexedSeq[String]) {
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
            name == "xl/sharedStrings.xml" || name.startsWith("xl/worksheets/")) {
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

    val sheets: Seq[(String, String)] = parts.get("xl/workbook.xml").map { b =>
      val r = xif.createXMLStreamReader(new ByteArrayInputStream(b))
      val out = mutable.ArrayBuffer.empty[(String, String)]
      var fallbackIdx = 0
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          val rid = (0 until r.getAttributeCount)
            .find(i => r.getAttributeLocalName(i) == "id")
            .map(r.getAttributeValue)
          fallbackIdx += 1
          val path = rid.flatMap(rels.get)
            .getOrElse(s"xl/worksheets/sheet$fallbackIdx.xml")
          out += ((name, path))
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

    Workbook(sheets, parts.toMap, shared)
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
    * "TRUE"/"FALSE" like readxl), and raw numeric text (default).
    */
  def sheetGrid(wb: Workbook, partPath: String): Vector[Array[String]] = {
    val bytes = wb.parts.getOrElse(partPath,
      throw new IllegalArgumentException(s"no worksheet part $partPath"))
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(bytes))
    val rows = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[(Int, String)]]
    var currentRow: mutable.ArrayBuffer[(Int, String)] = null
    var cellType = "n"
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
