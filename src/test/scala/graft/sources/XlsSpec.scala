package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files
import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The dependency-free legacy .xls (BIFF8) reader against workbooks BUILT
  * in this spec — real CFB + BIFF8 bytes, exercising the SST (incl. forced
  * CONTINUE splits mid-string), RK/MULRK/NUMBER numerics, BOOLERR,
  * LABEL, string-result FORMULA+STRING, date-format rendering under both
  * date systems, both CFB layouts (ministream and regular FAT), sheet
  * selection, and the mixed .xls/.xlsx distributed staging read.
  */
class XlsSpec extends AnyFunSuite with SparkSpec {

  import ExcelFixtures.{Inline, DateSerial, DateTimeSerial, Styled, xlsx}
  import XlsFixtures.{xls, xls5, FormulaStr, Rich}

  private def write(dir: java.io.File, name: String, bytes: Array[Byte]): Unit = {
    val f = new FileOutputStream(new java.io.File(dir, name))
    f.write(bytes); f.close()
  }

  test("sheetGrid: SST strings, RK/MULRK ints, NUMBER doubles, booleans, inline, formula strings, sparse cells") {
    val bytes = xls(Seq("Data" -> Seq(
      Seq("org", "beds", "open", "ratio"),
      Seq("RA1", 42, true, 3.25),
      Seq("RA2", null, false, FormulaStr("n/a")),
      Seq(Inline("RA3"), 7, 8, 9), // 7,8,9 consecutive ints → one MULRK
    )))
    val wb = Xls.open(bytes)
    assert(wb.sheetNames == Seq("Data"))
    val grid = Xls.sheetGrid(wb, 0)
    assert(grid(0).toSeq == Seq("org", "beds", "open", "ratio"))
    assert(grid(1).toSeq == Seq("RA1", "42", "TRUE", "3.25"))
    assert(grid(2).toSeq == Seq("RA2", null, "FALSE", "n/a"))
    assert(grid(3).toSeq == Seq("RA3", "7", "8", "9"))
  }

  test("RK decoding: int, int/100, truncated double, double/100") {
    assert(Xls.rkValue((1234 << 2) | 0x02) == 1234d)
    assert(Xls.rkValue((-5 << 2) | 0x02) == -5d)
    assert(Xls.rkValue((1234 << 2) | 0x03) == 12.34)
    val bits = java.lang.Double.doubleToLongBits(3.5)
    val rk = ((bits >> 32) & 0xFFFFFFFCL).toInt
    assert(Xls.rkValue(rk) == 3.5)
    assert(Xls.rkValue(rk | 0x01) == 0.035)
  }

  test("SST CONTINUE splits mid-string reassemble, compressed and 16-bit") {
    val long1 = "alpha-" * 10                 // splits across parts, 8-bit
    val long2 = "trust–" * 8 + "end"    // 16-bit chars (en-dash)
    val bytes = xls(Seq("S" -> Seq(
      Seq(long1, long2, "tail"),
    )), sstCap = 24) // tiny cap forces several CONTINUE records
    val wb = Xls.open(bytes)
    assert(wb.sst.toSet == Set(long1, long2, "tail"))
    val grid = Xls.sheetGrid(wb, 0)
    assert(grid(0).toSeq == Seq(long1, long2, "tail"))
  }

  test("date-styled serials render as ISO dates/datetimes; 1904 system; plain numerics stay raw") {
    val bytes = xls(Seq("Data" -> Seq(
      Seq("period", "updated", "pct"),
      Seq(DateSerial(40574), DateTimeSerial(40574.604166666664), Styled(123.45, 3)),
    )))
    val wb = Xls.open(bytes)
    val grid = Xls.sheetGrid(wb, 0)
    assert(grid(1).toSeq == Seq("2011-01-31", "2011-01-31 14:30:00", "123.45"),
      "builtin ifmt 14 → date; custom FORMAT yyyy-mm-dd hh:mm → datetime; ifmt 2 → raw")
    val raw = Xls.sheetGrid(wb, 0, renderDates = false)
    assert(raw(1)(0) == "40574")
    val wb04 = Xls.open(
      xls(Seq("Data" -> Seq(Seq("d"), Seq(DateSerial(40574 - 1462)))), date1904 = true))
    assert(Xls.sheetGrid(wb04, 0)(1)(0) == "2011-01-31")
  }

  test("both CFB layouts parse: ministream (small) and regular FAT (≥4096 padded)") {
    val rows = Seq("Data" -> Seq(Seq("h"), Seq("v1"), Seq(3.14)))
    val small = xls(rows)
    val big = xls(rows, padStreamTo = 6000)
    assert(small.length < big.length)
    for (bytes <- Seq(small, big)) {
      val grid = Xls.sheetGrid(Xls.open(bytes), 0)
      assert(grid.map(_.toSeq) == Vector(Seq("h"), Seq("v1"), Seq("3.14")))
    }
  }

  test("sheet selection by case-insensitive name regex across multiple sheets") {
    val bytes = xls(Seq(
      "Notes" -> Seq(Seq("junk")),
      "Providers" -> Seq(Seq("org_code"), Seq("RA1")),
    ))
    val wb = Xls.open(bytes)
    assert(wb.sheetNames == Seq("Notes", "Providers"))
    val idx = wb.sheetByName("^providers?$").get
    assert(Xls.sheetGrid(wb, idx)(1).toSeq == Seq("RA1"))
  }

  test("readExcelStaging: one glob reads MIXED .xls and .xlsx vintages distributed") {
    val dir = Files.createTempDirectory("graft_xls_mixed").toFile
    // pre-2013 vintage as BIFF8, later vintage as OOXML — same logical sheet
    write(dir, "Beds_2009.xls", xls(Seq(
      "Front" -> Seq(Seq("title")),
      "Provider" -> Seq(Seq("RTT", null), Seq("org_code", "n_beds"), Seq("RA1", 10), Seq("RA2", 20)))))
    write(dir, "Beds_2015.xlsx", xlsx(Seq(
      "Front" -> Seq(Seq("title")),
      "Provider" -> Seq(Seq("RTT", null), Seq("org_code", "n_beds"), Seq("RB9", 30)))))

    val df = StagingReader.readExcelStaging(spark,
      Seq(s"${dir.getAbsolutePath}/*.xls*"),
      sheetName = Some("^providers?$"), skip = 1)
    assert(df.columns.toSeq == Seq("fname", "org_code", "n_beds"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(("Beds_2009.xls", "RA1", "10"), ("Beds_2009.xls", "RA2", "20"),
      ("Beds_2015.xlsx", "RB9", "30")))
  }

  test("pre-2009 All_quarters workbook: all sheets read with sheet_name, quarters derived per sheet") {
    // one workbook per fiscal year, one sheet per quarter labeled by the
    // fiscal-quarter-END month; Mar wears the NEXT calendar year's suffix
    val dir = Files.createTempDirectory("graft_allq").toFile
    def sheet(rows: Seq[Seq[Any]]) = Seq(Seq("org_code", "n"): Seq[Any]) ++ rows
    write(dir, "All_quarters_2008.xls", xls(Seq(
      "June08" -> sheet(Seq(Seq("RA1", 1))),
      "Sep08" -> sheet(Seq(Seq("RA1", 2))),
      "Dec08" -> sheet(Seq(Seq("RA1", 3))),
      "Mar09" -> sheet(Seq(Seq("RA1", 4))),
    )))
    val df = StagingReader.read(spark, SourceSpec(
      paths = Seq(s"${dir.getAbsolutePath}/*.xls"),
      format = "excel",
      excelAllSheets = true))
      .withColumn("quarter",
        StagingReader.quarterFromSheet(org.apache.spark.sql.functions.col("fname"),
          org.apache.spark.sql.functions.col("sheet_name")))
    assert(df.columns.toSeq == Seq("fname", "sheet_name", "org_code", "n", "quarter"))
    val byN = df.collect().map(r => r.getAs[String]("n") -> r.getAs[String]("quarter")).toMap
    assert(byN == Map("1" -> "Q1", "2" -> "Q2", "3" -> "Q3", "4" -> "Q4"),
      s"sheet labels must map to fiscal quarters, got $byN")
  }

  test("BIFF5: inline LABEL/RSTRING codepage strings, numerics, booleans, formula strings, dates") {
    val bytes = xls5(Seq("Données" -> Seq(
      Seq("org", "café", "open", "ratio"),
      Seq("RA1", 42, true, 3.25),
      Seq(Rich("Trusts – provisional"), null, false, FormulaStr("n/a")),
      Seq(Inline("RA3"), 7, 8, 9), // consecutive ints → one MULRK
      Seq(DateSerial(40574), DateTimeSerial(40574.604166666664), Styled(123.45, 3)),
    )))
    val wb = Xls.open(bytes)
    assert(wb.biff5)
    assert(wb.sst.isEmpty, "BIFF5 has no shared string table")
    assert(wb.sheetNames == Seq("Données"), "sheet name decodes via the codepage")
    val grid = Xls.sheetGrid(wb, 0)
    assert(grid(0).toSeq == Seq("org", "café", "open", "ratio"))
    assert(grid(1).toSeq == Seq("RA1", "42", "TRUE", "3.25"))
    assert(grid(2).toSeq == Seq("Trusts – provisional", null, "FALSE", "n/a"))
    assert(grid(3).toSeq == Seq("RA3", "7", "8", "9"))
    assert(grid(4).take(3).toSeq == Seq("2011-01-31", "2011-01-31 14:30:00", "123.45"),
      "builtin ifmt 14 and byte-string custom FORMAT render; plain style stays raw")
  }

  test("BIFF5: 1904 date system and non-default codepage decode") {
    val wb04 = Xls.open(
      xls5(Seq("D" -> Seq(Seq("d"), Seq(DateSerial(40574 - 1462)))), date1904 = true))
    assert(Xls.sheetGrid(wb04, 0)(1)(0) == "2011-01-31")
    // windows-1251 (Cyrillic): byte 0xC0 is "А", not "À"
    val wb51 = Xls.open(xls5(Seq("Лист" -> Seq(Seq("Атлас"))), codepage = 1251))
    assert(wb51.sheetNames == Seq("Лист"))
    assert(Xls.sheetGrid(wb51, 0)(0).toSeq == Seq("Атлас"))
  }

  test("BIFF5: no CODEPAGE record defaults to windows-1252, not ISO-8859-1") {
    // 0x93/0x94 are curly quotes in windows-1252 but C1 controls in
    // ISO-8859-1 — the exact bytes real Excel 5/95 files rely on.
    val wb = Xls.open(xls5(Seq("Q1 “Adj”" -> Seq(
      Seq("col"), Seq("say “hi” – now"))), codepageMode = "none"))
    assert(wb.sheetNames == Seq("Q1 “Adj”"))
    assert(Xls.sheetGrid(wb, 0)(1)(0) == "say “hi” – now")
  }

  test("BIFF5: CODEPAGE record after FORMAT/BOUNDSHEET still decodes them") {
    // windows-1251: byte 0xC0 is "А"; an eager decode under the default
    // charset would have rendered the sheet name as "Àòëàñ"-style mojibake.
    val wb = Xls.open(xls5(Seq("Лист" -> Seq(Seq("Атлас"))),
      codepage = 1251, codepageMode = "late"))
    assert(wb.sheetNames == Seq("Лист"),
      "BOUNDSHEET byte string must decode under the late CODEPAGE")
    assert(Xls.sheetGrid(wb, 0)(0).toSeq == Seq("Атлас"))
  }

  test("BIFF5 and BIFF8 vintages of the same table read identically through one glob") {
    val dir = Files.createTempDirectory("graft_xls_biff5_mix").toFile
    val rows = Seq(
      "Provider" -> Seq(Seq("org_code", "n_beds"): Seq[Any], Seq("RA1", 10): Seq[Any]))
    write(dir, "Beds_1998.xls", xls5(rows))  // Excel 95 vintage
    write(dir, "Beds_2009.xls", xls(rows))   // Excel 97+ vintage
    val df = StagingReader.readExcelStaging(spark,
      Seq(s"${dir.getAbsolutePath}/*.xls"), sheetName = Some("^provider$"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("Beds_1998.xls", "RA1", "10"), ("Beds_2009.xls", "RA1", "10")))
  }

  test("SourceSpec format=excel flows .xls through the staging pipeline (sentinels, clean names)") {
    val dir = Files.createTempDirectory("graft_xls_spec").toFile
    write(dir, "Beds_Quarter_1_2009.xls", xls(Seq("Data" -> Seq(
      Seq("Org Code", "Beds Open"),
      Seq("RA1", Inline("-")), // sentinel → null
      Seq("RA2", 7)))))
    val df = StagingReader.read(spark, SourceSpec(
      paths = Seq(s"${dir.getAbsolutePath}/*.xls"),
      format = "excel"))
    assert(df.columns.toSet == Set("fname", "org_code", "beds_open"))
    val byOrg = df.collect().map(r =>
      r.getAs[String]("org_code") -> r.getAs[String]("beds_open")).toMap
    assert(byOrg == Map("RA1" -> null, "RA2" -> "7"))
  }
}
