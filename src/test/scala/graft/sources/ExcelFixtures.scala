package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Builds minimal but REAL .xlsx bytes for tests: zip + SpreadsheetML with
  * a workbook catalog, rels, shared strings, a styles part, and one part
  * per sheet. Cells: String → shared string; Inline(s) → inline string;
  * Boolean → boolean; DateSerial(d) → numeric with a builtin date style;
  * DateTimeSerial(d) → numeric with a custom datetime format; Styled(v, s)
  * → numeric with an arbitrary style index; any other non-null → numeric;
  * null → omitted (sparse).
  */
object ExcelFixtures {

  final case class Inline(s: String)
  final case class DateSerial(d: Double)
  final case class DateTimeSerial(d: Double)
  final case class Styled(v: Double, s: Int)

  def xlsx(sheets: Seq[(String, Seq[Seq[Any]])],
           date1904: Boolean = false): Array[Byte] = {
    val sharedIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedId(s: String): Int = sharedIdx.getOrElseUpdate(s, sharedIdx.size)

    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def num(d: Double) =
      if (d == math.floor(d) && !d.isInfinite) d.toLong.toString else d.toString

    val sheetXmls = sheets.map { case (_, rows) =>
      val body = rows.zipWithIndex.map { case (cells, ri) =>
        val cs = cells.zipWithIndex.collect {
          case (v, ci) if v != null =>
            val ref = s"${colRef(ci)}${ri + 1}"
            v match {
              case s: String => s"""<c r="$ref" t="s"><v>${sharedId(s)}</v></c>"""
              case Inline(s) => s"""<c r="$ref" t="inlineStr"><is><t>${esc(s)}</t></is></c>"""
              case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
              case DateSerial(d) => s"""<c r="$ref" s="1"><v>${num(d)}</v></c>"""
              case DateTimeSerial(d) => s"""<c r="$ref" s="2"><v>${num(d)}</v></c>"""
              case Styled(d, s) => s"""<c r="$ref" s="$s"><v>${num(d)}</v></c>"""
              case n => s"""<c r="$ref"><v>$n</v></c>"""
            }
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8"?><worksheet><sheetData>$body</sheetData></worksheet>"""
    }

    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |${if (date1904) """<workbookPr date1904="1"/>""" else ""}<sheets>
         |${sheets.zipWithIndex.map { case ((n, _), i) =>
             s"""<sheet name="${esc(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
           }.mkString("\n")}
         |</sheets></workbook>""".stripMargin
    // styles: xf 0 = General, xf 1 = builtin date (14), xf 2 = custom
    // datetime (165), xf 3 = a plain numeric format (2 decimal places)
    val styles =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<styleSheet>
         |<numFmts count="1"><numFmt numFmtId="165" formatCode="yyyy-mm-dd hh:mm"/></numFmts>
         |<cellXfs count="4">
         |<xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="165"/><xf numFmtId="2"/>
         |</cellXfs>
         |</styleSheet>""".stripMargin
    val rels =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<Relationships>
         |${sheets.indices.map(i =>
             s"""<Relationship Id="rId${i + 1}" Target="worksheets/sheet${i + 1}.xml"/>""").mkString("\n")}
         |</Relationships>""".stripMargin
    val sst =
      s"""<?xml version="1.0" encoding="UTF-8"?><sst>${
        sharedIdx.keys.map(s => s"<si><t>${esc(s)}</t></si>").mkString}</sst>"""

    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    put("xl/workbook.xml", workbook)
    put("xl/styles.xml", styles)
    put("xl/_rels/workbook.xml.rels", rels)
    sheetXmls.zipWithIndex.foreach { case (xml, i) => put(s"xl/worksheets/sheet${i + 1}.xml", xml) }
    put("xl/sharedStrings.xml", sst)
    z.close()
    bos.toByteArray
  }
}
