package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dependency-free XLSX reader against workbooks BUILT in this spec —
  * real zip + SpreadsheetML bytes, exercising shared strings, inline
  * strings, numerics, booleans, sparse cells, sheet selection by name
  * regex, skip rows, and the multi-file distributed read.
  */
class ExcelSpec extends AnyFunSuite with SparkSpec {

  /** Minimal but real .xlsx bytes. Cells: String → shared string; the
    * marker Inline(s) → inline string; Int/Double → numeric; Boolean →
    * boolean; null → omitted cell (sparse).
    */
  private case class Inline(s: String)

  private def xlsx(sheets: Seq[(String, Seq[Seq[Any]])]): Array[Byte] = {
    val sharedIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sharedId(s: String): Int = sharedIdx.getOrElseUpdate(s, sharedIdx.size)

    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    val sheetXmls = sheets.map { case (_, rows) =>
      val body = rows.zipWithIndex.map { case (cells, ri) =>
        val cs = cells.zipWithIndex.collect {
          case (v, ci) if v != null =>
            val ref = s"${colRef(ci)}${ri + 1}"
            v match {
              case s: String => s"""<c r="$ref" t="s"><v>${sharedId(s)}</v></c>"""
              case Inline(s) => s"""<c r="$ref" t="inlineStr"><is><t>${esc(s)}</t></is></c>"""
              case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
              case n => s"""<c r="$ref"><v>$n</v></c>"""
            }
        }.mkString
        s"""<row r="${ri + 1}">$cs</row>"""
      }.mkString
      s"""<?xml version="1.0" encoding="UTF-8"?><worksheet><sheetData>$body</sheetData></worksheet>"""
    }

    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>
         |${sheets.zipWithIndex.map { case ((n, _), i) =>
             s"""<sheet name="${esc(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
           }.mkString("\n")}
         |</sheets></workbook>""".stripMargin
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
    put("xl/_rels/workbook.xml.rels", rels)
    sheetXmls.zipWithIndex.foreach { case (xml, i) => put(s"xl/worksheets/sheet${i + 1}.xml", xml) }
    put("xl/sharedStrings.xml", sst)
    z.close()
    bos.toByteArray
  }

  private def write(dir: java.io.File, name: String, bytes: Array[Byte]): Unit = {
    val f = new FileOutputStream(new java.io.File(dir, name))
    f.write(bytes); f.close()
  }

  test("sheetGrid: shared/inline strings, numerics, booleans, sparse cells") {
    val bytes = xlsx(Seq("Data" -> Seq(
      Seq("org", "beds", "open"),
      Seq(Inline("RA1"), 42, true),
      Seq("RA2", null, false),
    )))
    val wb = Excel.open(bytes)
    assert(wb.sheetNames == Seq("Data"))
    val grid = Excel.sheetGrid(wb, wb.sheetByIndex(0).get)
    assert(grid(0).toSeq == Seq("org", "beds", "open"))
    assert(grid(1).toSeq == Seq("RA1", "42", "TRUE"))
    assert(grid(2).toSeq == Seq("RA2", null, "FALSE"))
  }

  test("colIndex decodes multi-letter references") {
    assert(Excel.colIndex("A1") == 0)
    assert(Excel.colIndex("Z9") == 25)
    assert(Excel.colIndex("AA12") == 26)
    assert(Excel.colIndex("BC23") == 54)
  }

  test("sheet selection by case-insensitive name regex (the reference's providers pick)") {
    val bytes = xlsx(Seq(
      "Notes" -> Seq(Seq("junk")),
      "Providers" -> Seq(Seq("org_code"), Seq("RA1")),
    ))
    val wb = Excel.open(bytes)
    val grid = Excel.sheetGrid(wb, wb.sheetByName("^providers?$").get)
    assert(grid(1).toSeq == Seq("RA1"))
  }

  test("readExcelStaging: distributed multi-file read with skip + header + fname") {
    val dir = Files.createTempDirectory("graft_xlsx").toFile
    val sheet = (rows: Seq[Seq[Any]]) => Seq(
      "Front" -> Seq(Seq("title page")),
      "Provider" -> (Seq(Seq("RTT data", null), Seq(null, null)) ++ rows))
    write(dir, "a.xlsx", xlsx(sheet(Seq(
      Seq("org_code", "n_beds"), Seq("RA1", 10), Seq("RA2", 20)))))
    write(dir, "b.xlsx", xlsx(sheet(Seq(
      Seq("org_code", "n_beds"), Seq("RB9", 30)))))

    val df = StagingReader.readExcelStaging(spark,
      Seq(s"${dir.getAbsolutePath}/*.xlsx"),
      sheetName = Some("^providers?$"), skip = 2)
    assert(df.columns.toSeq == Seq("fname", "org_code", "n_beds"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(("a.xlsx", "RA1", "10"), ("a.xlsx", "RA2", "20"),
      ("b.xlsx", "RB9", "30")))
  }

  test("SourceSpec format=excel flows through the staging pipeline (sentinels, clean names)") {
    val dir = Files.createTempDirectory("graft_xlsx2").toFile
    write(dir, "Beds_Quarter_1_2012.xlsx", xlsx(Seq("Data" -> Seq(
      Seq("Org Code", "Beds Open"),
      Seq("RA1", Inline("-")),   // sentinel → null
      Seq("RA2", 7)))))
    val df = StagingReader.read(spark, SourceSpec(
      paths = Seq(s"${dir.getAbsolutePath}/*.xlsx"),
      format = "excel"))
    assert(df.columns.toSet == Set("fname", "org_code", "beds_open"))
    val m = df.collect().map(r =>
      r.getAs[String]("org_code") -> Option(r.getAs[String]("beds_open"))).toMap
    assert(m("RA1").isEmpty && m("RA2").contains("7"))
    assert(StagingReader.quarterFromName(lit("Beds_Quarter_1_2012.xlsx")) != null)
  }
}
