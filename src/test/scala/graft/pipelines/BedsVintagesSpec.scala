package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Fixture pins for the overnight/day beds vintage programs
  * (build_datasets_overnight_day_beds.R:41-444) at their boundaries: the
  * 2000-01 descriptive-header vintage (with the reference's INVERTED
  * available/occupied percent bug), the 2001-10 position-suffixed vintage,
  * and the 2010-24 quarterly layout — assembled column order is pinned
  * against the committed clean CSV headers.
  */
class BedsVintagesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 2000-01 overnight staged fixture: descriptive headers, sheet column
  // order matching the committed 2000-10 CSV (avail: total, general acute,
  // mental illness, learning disability, maternity).
  private def early0010 = Seq(
    ("f00.xls", "2000-01", "RA1", "Alpha trust", "100", "60", "10", "5", "25", "40", "20",
      "80", "50", "8", "4", "20", "30", "15"),
    ("f00.xls", "2000-01", "RA2", "Beta trust", "50", "30", "5", "0", "15", "10", "5",
      "0", "25", "4", "0", "12", "8", "4"),
    ("f00.xls", "2000-01", null, null, null, null, null, null, null, null, null,
      null, null, null, null, null, null, null),
  ).toDF("fname", "Year", "OrgID", "Name",
    "Available All Sectors", "Available General Acute", "Available Mental Illness",
    "Available Learning Disability", "Available Maternity",
    "Available Acute", "Available Geriatric",
    "Occupied All Sectors", "Occupied General Acute", "Occupied Mental Illness",
    "Occupied Learning Disability", "Occupied Maternity",
    "Occupied Acute", "Occupied Geriatric")

  // 2003-04 overnight staged fixture: position-suffixed headers + an sha
  // column (regional cascade) + a leftover numbered column (digit drop).
  private def late0010 = Seq(
    ("f03.xls", "2003-04", "RA1", "Alpha trust", "London", "110", "6", "28", "90", "5",
      "24", "0.8182", "0.8333", "0.8571", "11", "9", "0.8182", "12", "10", "0.8333", "7"),
  ).toDF("fname", "Year", "OrgID", "Name", "SHA",
    "Total...5", "General Acute...6", "Maternity...12",
    "Total...14", "General Acute...15", "Maternity...21",
    "Total...23", "General Acute...24", "Maternity...30",
    "Mental Illness...10", "Mental Illness...19", "Mental Illness...28",
    "Learning Disability...11", "Learning Disability...20", "Learning Disability...29",
    "Acute...7")

  private def day0010Staged = Seq(
    ("d00.xls", "2000-01", "RA1", "Alpha trust", "12", "3", "2"),
    ("d00.xls", "2000-01", "RA2", "Beta trust", "7", "1", "1"),
  ).toDF("fname", "Year", "OrgID", "Name", "Available Beds",
    "Neonates and children", "Other ages")

  test("overnight0010 early vintage: renames, inverted percent bug, acute/geriatric drop") {
    val out = BedsVintages.overnight0010(early0010)
    assert(out.columns.toSeq == Seq("fname", "year", "org_code", "org_name",
      "total_on_beds_available", "general_acute_on_beds_available",
      "mental_illness_on_beds_available", "learn_disabil_on_beds_available",
      "maternity_on_beds_available",
      "total_on_beds_occupied", "general_acute_on_beds_occupied",
      "mental_illness_on_beds_occupied", "learn_disabil_on_beds_occupied",
      "maternity_on_beds_occupied",
      "total_on_beds_percent_occupied", "general_acute_on_beds_percent_occupied",
      "learn_disabil_on_beds_percent_occupied", "maternity_on_beds_percent_occupied",
      "mental_illness_on_beds_percent_occupied"))
    val rows = out.collect().map(r => r.getAs[String]("org_code") -> r).toMap
    assert(rows.size == 2, "the nameless row is filtered")
    assert(rows("RA1").getAs[String]("year") == "2000")
    assert(rows("RA1").getAs[String]("org_name") == "ALPHA TRUST")
    // the reference's percent is available/occupied — INVERTED — so 100/80:
    assert(math.abs(rows("RA1").getAs[Double]("total_on_beds_percent_occupied") - 1.25) < 1e-12)
    // occupied=0, available>0 → +Inf → na_if → null:
    assert(rows("RA2").isNullAt(rows("RA2").fieldIndex("total_on_beds_percent_occupied")))
    // 0/0 → NaN is KEPT (na_if only maps exact Inf):
    assert(rows("RA2").getAs[Double]("learn_disabil_on_beds_percent_occupied").isNaN)
    // and a regular ratio: mental illness 5/4
    assert(math.abs(rows("RA2").getAs[Double]("mental_illness_on_beds_percent_occupied") - 1.25) < 1e-12)
  }

  test("overnight0010 numbered vintage: position-suffix renames, digit drop, sha drop") {
    val out = BedsVintages.overnight0010(late0010)
    assert(!out.columns.contains("sha"), "sha removed by the regional cascade")
    assert(!out.columns.exists(_.exists(_.isDigit)), "leftover numbered columns dropped")
    val r = out.collect().head
    assert(r.getAs[String]("year") == "2003")
    assert(r.getAs[Double]("total_on_beds_available") == 110.0)
    assert(r.getAs[Double]("mental_illness_on_beds_occupied") == 9.0)
    assert(math.abs(r.getAs[Double]("maternity_on_beds_percent_occupied") - 0.8571) < 1e-12)
  }

  test("assemble0010 reproduces the committed 2000-10 CSV header") {
    val out = BedsVintages.assemble0010(
      Seq(early0010, late0010), Seq(day0010Staged))
    // header of data/available-and-occupied-beds/overnight_day_beds_2000_10_clean.csv
    assert(out.columns.toSeq == Seq("year", "org_code", "org_name",
      "total_on_beds_available", "general_acute_on_beds_available",
      "mental_illness_on_beds_available", "learn_disabil_on_beds_available",
      "maternity_on_beds_available",
      "total_on_beds_occupied", "general_acute_on_beds_occupied",
      "mental_illness_on_beds_occupied", "learn_disabil_on_beds_occupied",
      "maternity_on_beds_occupied",
      "total_on_beds_percent_occupied", "general_acute_on_beds_percent_occupied",
      "learn_disabil_on_beds_percent_occupied", "maternity_on_beds_percent_occupied",
      "mental_illness_on_beds_percent_occupied",
      "total_day_beds_available"))
    val ra1 = out.filter(org.apache.spark.sql.functions.col("org_code") === "RA1").collect()
    assert(ra1.length == 2, "RA1 appears in both vintage years")
    val y2000 = ra1.find(_.getAs[String]("year") == "2000").get
    assert(y2000.getAs[String]("total_day_beds_available") == "12",
      "day total joins on (no cast in the reference's day cleaner)")
  }

  // ---- 2010-24 quarterly layout ----

  private val cols1024 = Seq("fname", "Year", "Period", "Region", "Org Code", "Org Name",
    "Total...6", "General Acute...7", "Learning Disabilities...8", "Maternity...9",
    "Mental Illness...10", "x11", "Total...12", "General Acute...13",
    "Learning Disabilities...14", "Maternity...15", "Mental Illness...16", "x17",
    "Total...18", "General Acute...19", "Learning Disabilities...20", "Maternity...21",
    "Mental Illness...22")

  private def staged1024(rows: Seq[Seq[String]]) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(Row.fromSeq): _*),
      StructType(cols1024.map(StructField(_, StringType, nullable = true))))

  private def onRow(period: String, yearRange: String) = Seq(
    "f11.xlsx", yearRange, period, "London", "RA1", "Alpha trust",
    "100", "60", "5", "25", "10", null, "80", "50", "4", "20", "8", null,
    "0.8", "0.833", "0.8", "0.8", "0.8")

  test("clean1024: spacer/positional drops, quarter re-keying, Q4 wears the end year") {
    val out = BedsVintages.clean1024(
      staged1024(Seq(onRow("June", "2010-11"), onRow("March", "2010-11"),
        onRow("September", "2010-11"), onRow("December", "2010-11"))),
      overnight = true)
    assert(!out.columns.contains("region") && !out.columns.exists(_.startsWith("x1")))
    val byQ = out.collect().map(r =>
      r.getAs[String]("quarter") -> r.getAs[String]("year")).toMap
    assert(byQ == Map("Q1" -> "2010", "Q2" -> "2010", "Q3" -> "2010", "Q4" -> "2011"))
  }

  test("assemble1024 reproduces the committed 2010-24 CSV header (quarter between blocks)") {
    val out = BedsVintages.assemble1024(
      Seq(staged1024(Seq(onRow("June", "2010-11")))),
      Seq(staged1024(Seq(onRow("June", "2010-11")))))
    assert(out.columns.toSeq == Seq("year", "period_end", "org_code", "org_name",
      "total_on_beds_available", "general_acute_on_beds_available",
      "learn_disabil_on_beds_available", "maternity_on_beds_available",
      "mental_illness_on_beds_available",
      "total_on_beds_occupied", "general_acute_on_beds_occupied",
      "learn_disabil_on_beds_occupied", "maternity_on_beds_occupied",
      "mental_illness_on_beds_occupied",
      "total_on_beds_percent_occupied", "general_acute_on_beds_percent_occupied",
      "learn_disabil_on_beds_percent_occupied", "maternity_on_beds_percent_occupied",
      "mental_illness_on_beds_percent_occupied",
      "quarter",
      "total_day_beds_available", "general_acute_day_beds_available",
      "learn_disabil_day_beds_available", "maternity_day_beds_available",
      "mental_illness_day_beds_available",
      "total_day_beds_occupied", "general_acute_day_beds_occupied",
      "learn_disabil_day_beds_occupied", "maternity_day_beds_occupied",
      "mental_illness_day_beds_occupied",
      "total_day_beds_percent_occupied", "general_acute_day_beds_percent_occupied",
      "learn_disabil_day_beds_percent_occupied", "maternity_day_beds_percent_occupied",
      "mental_illness_day_beds_percent_occupied"))
    assert(out.count() == 1)
  }

  test("2003-04 overnight vintage replays from REAL .xls bytes: duplicate-header repair → spec0010 → overnight0010") {
    // the real 30-column position-suffixed layout: 4 id columns, then
    // available/occupied/percent blocks of 8 measures separated by empty
    // spacer columns — every measure NAME repeats across blocks, so the
    // whole vintage depends on staging reproducing readxl's `...<pos>`
    // repair (Total...5 → total_5 → total_on_beds_available, etc.)
    val block = Seq("Total", "General Acute", "Acute", "Geriatric",
      "Single Specialty", "Mental Illness", "Learning Disability", "Maternity")
    val headerRow: Seq[Any] =
      Seq("Year", "OrgID", "Name", "SHA") ++ block ++ Seq(null) ++
        block ++ Seq(null) ++ block
    val dataRow: Seq[Any] =
      Seq("2003-04", "RA1", "Alpha trust", "London",
        110, 90, 10, 5, 3, 6, 12, 28, null,
        90, 75, 8, 4, 2, 5, 10, 24, null,
        0.8182, 0.8333, 0.8, 0.8, 0.67, 0.8333, 0.8333, 0.8571)
    val junk: Seq[Any] = Seq("NHS organisations in England: beds open overnight")
    val dir = java.nio.file.Files.createTempDirectory("graft_beds_xls").toFile
    val f = new java.io.FileOutputStream(
      new java.io.File(dir, "NHS_Organisations_in_England_2003.xls"))
    f.write(graft.sources.XlsFixtures.xls(Seq(
      "Data" -> Seq(junk, junk, junk, junk, headerRow, dataRow))))
    f.close()

    val staged = graft.sources.StagingReader.read(spark,
      BedsVintages.spec0010(Seq(s"${dir.getAbsolutePath}/*.xls"), early = false))
    val out = BedsVintages.overnight0010(staged)
    assert(!out.columns.exists(_.exists(_.isDigit)),
      s"positional leftovers must drop: ${out.columns.toSeq}")
    assert(!out.columns.contains("sha") && !out.columns.exists(_.startsWith("acute")))
    val r = out.collect().head
    assert(r.getAs[String]("org_code") == "RA1" && r.getAs[String]("year") == "2003")
    assert(r.getAs[Double]("total_on_beds_available") == 110d)
    assert(r.getAs[Double]("total_on_beds_occupied") == 90d)
    assert(r.getAs[Double]("maternity_on_beds_percent_occupied") == 0.8571)
    assert(r.getAs[Double]("mental_illness_on_beds_available") == 6d)
  }

  test("vintage output feeds the adjustment stage end-to-end") {
    val beds1024 = BedsVintages.assemble1024(
      Seq(staged1024(Seq(onRow("June", "2011-12")))),
      Seq(staged1024(Seq(onRow("June", "2011-12")))))
    val beds0010 = BedsVintages.assemble0010(Seq(early0010, late0010), Seq(day0010Staged))
    val lookup = Seq(("RA9", "RX9", 0, 0)).toDF(
      "old_code", "final_code", "experiences_split", "problematic")
    val adjusted = OvernightBeds.assembleAdjusted(beds1024, beds0010, lookup)
    assert(adjusted.count() > 0)
    assert(adjusted.columns.contains("exp_problematic_org_change"))
  }
}
