package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Fixture pins for the critical-care vintage programs
  * (build_datasets_critical_care_beds.R:41-255): the 2002-10 title-row-date
  * layout with in-data header promotion, and the 2010-20 positional-measure
  * layout with the fiscal year fix-up, the PCT rename, and the reference's
  * adult-only percent-NA bug.
  */
class CriticalCareVintagesSpec extends AnyFunSuite with SparkSpec {

  // 2002-10 staged fixture: readxl promoted the TITLE row to names (hence
  // the date riding in a column name); the real header is inside the data.
  private def staged0210 = {
    val cols = Seq("fname",
      "Open and staffed adult critical care beds January 2005", "x2", "x3", "x4", "x5")
    val rows = Seq(
      Seq("cc05.xls", "Org ID", "Name", "Year", "SHA",
        "Open and staffed adult critical care beds"),
      Seq("cc05.xls", "RA1", "Alpha trust", "2004-05", "London", "12"),
      Seq("cc05.xls", "RA2", "Beta trust", "2004-05", "London", "0"),
      Seq("cc05.xls", null, null, null, null, null),
    )
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(Row.fromSeq): _*),
      StructType(cols.map(StructField(_, StringType, nullable = true))))
  }

  test("clean0210: date from the title column name, header promoted, six common columns") {
    val out = CriticalCareVintages.clean0210(staged0210, "^Org ID$")
    assert(out.columns.toSeq == Seq("org_code", "org_name",
      "number_of_adult_critical_care_beds_open", "date", "month", "year"))
    val rows = out.collect().map(r => r.getAs[String]("org_code") -> r).toMap
    assert(rows.size == 2, "the nameless row is filtered")
    assert(rows("RA1").getAs[String]("org_name") == "ALPHA TRUST")
    assert(rows("RA1").getAs[String]("number_of_adult_critical_care_beds_open") == "12")
    assert(rows("RA1").getAs[java.sql.Date]("date").toString == "2005-01-01")
    assert(rows("RA1").getAs[String]("month") == "January")
    assert(rows("RA1").getAs[Int]("year") == 2005)
  }

  // 2010-20 staged fixture: fname + month/year from the FILENAME, then the
  // sheet columns — org id/name, a regional column, the sheet's own
  // Year/Month copies, an all-null spacer, and the 10 positional measures.
  private val cols1020 = Seq("fname", "month", "year",
    "Code", "Org Name", "Region", "Year", "Month", "Notes",
    "Adult crit open", "Paed IC open", "Neonatal cots open",
    "Adult crit occupied", "Paed IC occupied", "Neonatal cots occupied",
    "Adult pct", "Paed pct", "Neonatal pct", "Transfers")

  private def staged1020(rows: Seq[Seq[String]]) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(Row.fromSeq): _*),
      StructType(cols1020.map(StructField(_, StringType, nullable = true))))

  private def row1020(month: String, yearRange: String, code: String, name: String,
                      adultOpen: String, adultPct: String, paedOpen: String = "2",
                      paedPct: String = "0.5") = Seq(
    "cc11.xlsx", month, yearRange, code, name, "London", yearRange, month, null,
    adultOpen, paedOpen, "3", "6", "1", "2", adultPct, paedPct, "0.67", "0")

  test("clean1020: positional measures, fiscal year fix-up, PCT rename, adult-only percent bug") {
    val out = CriticalCareVintages.clean1020(staged1020(Seq(
      row1020("June", "2010-11", "RA1", "Alpha trust", "8", "0.75"),
      row1020("January", "2010-11", "RA1", "Alpha trust", "8", "0.75"),
      row1020("June", "2010-11", "RA2", "Southwark Primary Care Trust", "0", "0.9",
        paedOpen = "0", paedPct = "0.4"),
    )))
    assert(out.columns.count(_ == "year") == 1, "the sheet's own Year/Month copies dropped")
    assert(!out.columns.exists(c => c.contains("region") || c == "notes"))
    val rows = out.collect()
    val june1 = rows.find(r => r.getAs[String]("org_code") == "RA1" &&
      r.getAs[String]("month") == "June").get
    assert(june1.getAs[String]("year") == "2010")
    assert(june1.getAs[java.sql.Date]("date").toString == "2010-06-01")
    assert(june1.getAs[String]("number_of_adult_critical_care_beds_open") == "8")
    assert(june1.getAs[String]("adult_critical_care_beds_percent_occupied") == "0.75")
    // January of fiscal 2010-11 wears the END year
    val jan = rows.find(r => r.getAs[String]("month") == "January").get
    assert(jan.getAs[String]("year") == "2011")
    assert(jan.getAs[java.sql.Date]("date").toString == "2011-01-01")
    // PCT rename + the replicated bug: adult percent nulled when 0 beds
    // open, but paediatric percent SURVIVES its own 0-open (the reference's
    // for-loop returns after the first bed type)
    val ra2 = rows.find(_.getAs[String]("org_code") == "RA2").get
    assert(ra2.getAs[String]("org_name") == "SOUTHWARK PCT")
    assert(ra2.isNullAt(ra2.fieldIndex("adult_critical_care_beds_percent_occupied")))
    assert(ra2.getAs[String]("paediatric_intensive_care_beds_percent_occupied") == "0.4")
  }

  test("pre-2010 vintage replays from REAL .xls bytes: BIFF8 scan → spec0210 → clean0210") {
    // the exact shape a 2002-10 publication wears: a notes sheet to skip, a
    // title row readxl promotes to names (the date rides in it), the real
    // header inside the data, then the trust rows
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_xls").toFile
    val bytes = graft.sources.XlsFixtures.xls(Seq(
      "Notes" -> Seq(Seq("Critical care capacity, definitions")),
      "Level of care by Trust" -> Seq(
        Seq("Open and staffed adult critical care beds January 2005"),
        Seq("Org ID", "Name", "Year", "SHA", "Open and staffed adult critical care beds"),
        Seq("RA1", "Alpha trust", "2004-05", "London", 12),
        Seq("RA2", "Beta trust", "2004-05", "London", 0),
      )))
    val f = new java.io.FileOutputStream(new java.io.File(dir, "cc_jan05.xls"))
    f.write(bytes); f.close()

    val staged = graft.sources.StagingReader.read(spark,
      CriticalCareVintages.spec0210(Seq(s"${dir.getAbsolutePath}/*.xls")))
    val out = CriticalCareVintages.clean0210(staged, "^Org ID$")
    assert(out.columns.toSeq == Seq("org_code", "org_name",
      "number_of_adult_critical_care_beds_open", "date", "month", "year"))
    val rows = out.collect().map(r => r.getAs[String]("org_code") -> r).toMap
    assert(rows.keySet == Set("RA1", "RA2"))
    assert(rows("RA1").getAs[String]("number_of_adult_critical_care_beds_open") == "12")
    assert(rows("RA1").getAs[java.sql.Date]("date").toString == "2005-01-01")
    assert(rows("RA2").getAs[String]("org_name") == "BETA TRUST")
  }

  test("assembled panel feeds the monthly adjustment stage end-to-end") {
    import spark.implicits._
    val panel = CriticalCareVintages.assemble(
      Seq(staged0210 -> "^Org ID$"),
      Seq(staged1020(Seq(row1020("June", "2010-11", "RA1", "Alpha trust", "8", "0.75")))))
    assert(panel.columns.take(6).toSeq == Seq("org_code", "org_name",
      "number_of_adult_critical_care_beds_open", "date", "month", "year"),
      "rbind(fill) keeps the 2002-10 era's column order first")
    assert(panel.filter(col("org_code") === "RA1").count() == 2)
    val lookup = Seq(("RA9", "RX9", 0, 0)).toDF(
      "old_code", "final_code", "experiences_split", "problematic")
    val adjusted = CriticalCare.adjust(panel, lookup)
    assert(adjusted.count() > 0)
    assert(adjusted.columns.contains("exp_problematic_org_change"))
  }
}
