package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dependency-free XLSX reader against workbooks BUILT in this spec —
  * real zip + SpreadsheetML bytes, exercising shared strings, inline
  * strings, numerics, booleans, sparse cells, sheet selection by name
  * regex, skip rows, and the multi-file distributed read.
  */
class ExcelSpec extends AnyFunSuite with SparkSpec {

  import ExcelFixtures.{xlsx, Inline}

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

  test("date-styled serials render as ISO dates/datetimes; 1904 system; plain numerics stay raw") {
    import ExcelFixtures.{DateSerial, DateTimeSerial, Styled}
    val bytes = xlsx(Seq("Data" -> Seq(
      Seq("period", "updated", "pct"),
      Seq(DateSerial(40574), DateTimeSerial(40574.604166666664), Styled(123.45, 3)),
    )))
    val wb = Excel.open(bytes)
    val grid = Excel.sheetGrid(wb, wb.sheetByIndex(0).get)
    assert(grid(1).toSeq == Seq("2011-01-31", "2011-01-31 14:30:00", "123.45"),
      "builtin date fmt → date; custom yyyy-mm-dd hh:mm → datetime; numeric fmt → raw")
    val raw = Excel.sheetGrid(wb, wb.sheetByIndex(0).get, renderDates = false)
    assert(raw(1)(0) == "40574", "renderDates=false surfaces the raw serial")
    // 1904 date system: the same calendar date sits 1462 serials earlier
    val wb04 = Excel.open(
      xlsx(Seq("Data" -> Seq(Seq("d"), Seq(DateSerial(40574 - 1462)))), date1904 = true))
    assert(Excel.sheetGrid(wb04, wb04.sheetByIndex(0).get)(1)(0) == "2011-01-31")
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

  test("a file WITHOUT the requested sheet is skipped — and cannot drive the schema") {
    val dir = Files.createTempDirectory("graft_xlsx_skip").toFile
    // first by path order: a summary workbook with no provider sheet — the
    // reference's readers skip such files rather than falling back
    write(dir, "a_summary.xlsx", xlsx(Seq("Notes" -> Seq(Seq("junk", "junk2")))))
    write(dir, "b_data.xlsx", xlsx(Seq(
      "Front" -> Seq(Seq("title")),
      "Provider" -> Seq(Seq("org_code", "n_beds"), Seq("RA1", 10)))))
    val df = StagingReader.readExcelStaging(spark,
      Seq(s"${dir.getAbsolutePath}/*.xlsx"), sheetName = Some("^providers?$"))
    assert(df.columns.toSeq == Seq("fname", "org_code", "n_beds"),
      "schema must come from the first file WITH the sheet")
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("b_data.xlsx", "RA1")), "the sheetless file contributes no rows")
  }

  test("fileNameFilter prunes files BEFORE parsing (an excluded junk file cannot fail the read)") {
    val dir = Files.createTempDirectory("graft_xlsx_filter").toFile
    // not a workbook at all — would throw if parsed
    write(dir, "England_totals.xlsx", "this is not a zip".getBytes("UTF-8"))
    write(dir, "Trust_data.xlsx", xlsx(Seq("Data" -> Seq(Seq("org_code"), Seq("RA1")))))
    val df = StagingReader.readExcelStaging(spark,
      Seq(s"${dir.getAbsolutePath}/*.xlsx"),
      fileNameFilter = Some("^(?!.*England)"))
    assert(df.collect().map(_.getString(1)).toSeq == Seq("RA1"))
  }

  test("a sheet wider than the schema fails loudly instead of truncating data") {
    val dir = Files.createTempDirectory("graft_xlsx_wide").toFile
    write(dir, "a.xlsx", xlsx(Seq("Data" -> Seq(Seq("org_code", "n"), Seq("RA1", 1)))))
    write(dir, "b_wide.xlsx", xlsx(Seq("Data" -> Seq(
      Seq("org_code", "n", "extra"), Seq("RA2", 2, 3)))))
    val df = StagingReader.readExcelStaging(spark, Seq(s"${dir.getAbsolutePath}/*.xlsx"))
    val e = intercept[org.apache.spark.SparkException] { df.collect() }
    assert(e.getMessage.contains("refusing to truncate") ||
      Option(e.getCause).exists(_.getMessage.contains("refusing to truncate")),
      s"expected the refusing-to-truncate error, got: ${e.getMessage.take(300)}")
  }

  test("all-null padding beyond the schema truncates harmlessly (footnote bounding boxes)") {
    val dir = Files.createTempDirectory("graft_xlsx_pad").toFile
    // the sheet's bounding box is 3 wide because a PREAMBLE cell sits in
    // column C; the data region is 2 wide and must read fine
    write(dir, "a.xlsx", xlsx(Seq("Data" -> Seq(
      Seq("org_code", "n"), Seq("RA1", 1)))))
    write(dir, "b_noted.xlsx", xlsx(Seq("Data" -> Seq(
      Seq("org_code", "n"), Seq("RA2", 2), Seq(null, null, "Source: KH03")))))
    val df = StagingReader.readExcelStaging(spark, Seq(s"${dir.getAbsolutePath}/*.xlsx"))
    val e = intercept[org.apache.spark.SparkException] { df.collect() }
    assert(e.getMessage.contains("Source: KH03") ||
      Option(e.getCause).exists(_.getMessage.contains("Source: KH03")),
      "a non-null footnote cell beyond the schema is still data loss — loud")
    // but a wide sheet whose extra cells are ALL null in data rows is fine
    val dir2 = Files.createTempDirectory("graft_xlsx_pad2").toFile
    write(dir2, "a.xlsx", xlsx(Seq("Data" -> Seq(
      Seq("org_code", "n"), Seq("RA1", 1)))))
    write(dir2, "b_sparse.xlsx", xlsx(Seq("Data" -> Seq(
      Seq("org_code", "n", "note col"), Seq("RA2", 2, null)))))
    val ok = StagingReader.readExcelStaging(spark, Seq(s"${dir2.getAbsolutePath}/*.xlsx"))
    assert(ok.collect().map(_.getString(1)).toSet == Set("RA1", "RA2"))
  }

  test("duplicate and empty headers get readxl-style positional suffixes") {
    val dir = Files.createTempDirectory("graft_xlsx_dup").toFile
    write(dir, "d.xlsx", xlsx(Seq("Data" -> Seq(
      Seq("Year", "Total", "General Acute", "Total", null, "Total"),
      Seq("2003-04", 1, 2, 3, 4, 5)))))
    val df = StagingReader.readExcelStaging(spark, Seq(s"${dir.getAbsolutePath}/*.xlsx"))
    // every occurrence of a duplicated name is suffixed with its 1-based
    // sheet position; empty cells become bare "...N" (janitor later turns
    // these into total_2 / x5 — the names the vintage rename tables key on)
    assert(df.columns.toSeq == Seq("fname", "Year", "Total...2", "General Acute",
      "Total...4", "...5", "Total...6"))
  }
}
