package graft.pipelines

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Fixture pins for the three RTT vintage extraction programs
  * (build_datasets_wait_times.R:60-383) at their boundaries: the jan07
  * rename chain + percent-NA rule, the jan11 two-sheet join with the
  * replicated treatment-function-code quirk, and the apr13 52+-week band
  * harmonisation.
  */
class WaitTimesVintagesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("jan07: rename chain, band normalisation, incomplete totals, percent-NA rule") {
    val staged = Seq(
      ("F1", "RA1", "Alpha Trust", "2008-01-01", 10.0, 10.0, 0.95),
      ("F1", "RA2", "Beta Trust", "2008-01-01", 5.0, 0.0, 0.0),   // all-zero month
      ("F1", "RA3", "Gamma Trust", "2008-01-01", 2.0, 0.0, 0.25), // zero total, real pct
    ).toDF("fname", "Code", "Provider", "date", "18-26", "Total all",
      "percent within 18 weeks column bj column bi")
      .withColumn("pathway", org.apache.spark.sql.functions.lit("incomplete"))

    val out = WaitTimesVintages.jan07Dec10(staged, "incomplete")
    assert(out.columns.toSet == Set("fname", "org_code", "org_name", "date",
      "incomplete_between_18_26", "incomplete_total_number_of_incomplete_pathways",
      "incomplete_percent_within_18_weeks"))
    val byOrg = out.collect().map(r =>
      r.getAs[String]("org_code") ->
        Option(r.getAs[Any]("incomplete_percent_within_18_weeks"))).toMap
    assert(byOrg("RA1").contains(0.95))
    assert(byOrg("RA2").isEmpty, "0 percent over an all-zero month must be null")
    assert(byOrg("RA3").contains(0.25), "a real percent over a zero total survives")
  }

  test("jan07: sequential rename chain routes provider → provider_name → org_name") {
    val staged = Seq(("F1", "RA1", "Alpha", "2008-01-01", 1.0))
      .toDF("fname", "Provider Code", "Provider", "date", "Total all")
      .withColumn("pathway", org.apache.spark.sql.functions.lit("admitted"))
    val out = WaitTimesVintages.jan07Dec10(staged, "admitted")
    assert(out.columns.contains("org_code") && out.columns.contains("org_name"))
    assert(out.columns.contains("admitted_total_number_of_completed_pathways_all"))
  }

  test("jan11: two-sheet natural join attaches summary percentile to the total row") {
    val summary = Seq(
      ("S1", "RA1", "Alpha Trust", "2012-01-01", 20.5, "X"),
    ).toDF("fname", "org_code", "Provider Name", "date",
      "95th percentile waiting time in weeks", "SHA Code")
    val specialties = Seq(
      ("S1", "RA1", "Alpha Trust", "2012-01-01", "AP999", "Total", 30.0),
      ("S1", "RA1", "Alpha Trust", "2012-01-01", "100", "General Surgery", 12.0),
    ).toDF("fname", "org_code", "Provider Name", "date",
      "treatment_function_code", "treatment_function", "18-26")

    val out = WaitTimesVintages.jan11Mar13(summary, specialties, "admitted")
    val rows = out.collect().map(r =>
      r.getAs[String]("treatment_function_code") ->
        Option(r.getAs[Any]("admitted_95th_percentile_waiting_time_in_weeks"))).toMap
    assert(rows("AP999").contains(20.5), "summary variables join onto the Total row")
    assert(rows("100").isEmpty, "specialty rows have no summary percentile")
    assert(!out.columns.contains("sha_code"))
    assert(out.columns.contains("admitted_between_18_26"))
  }

  test("jan11: replicated quirk — non_admitted falls through to IP999") {
    val summary = Seq(("S1", "RA1", "A", "2012-01-01", 1.0))
      .toDF("fname", "org_code", "Provider Name", "date", "Total within 18 weeks")
    val specialties = Seq(("S1", "RA1", "A", "2012-01-01", "NP999", "Total", 2.0))
      .toDF("fname", "org_code", "Provider Name", "date",
        "treatment_function_code", "treatment_function", "18-26")
    val out = WaitTimesVintages.jan11Mar13(summary, specialties, "non_admitted")
    // the reference compares against the hyphenated literal, so the
    // underscored pathway lands on the ELSE branch (R:268-272)
    val summarized = out.filter(out("treatment_function_code") === "IP999")
    assert(out.count() == 1 && summarized.count() == 0,
      "summary row keys on IP999, so the NP999 specialty row stays unmatched")
  }

  test("apr13: 52-plus harmonisation drops high bands and auxiliary totals") {
    val staged = Seq(
      ("F1", "RA1", "Alpha", "100", "General Surgery", "2016-01-01",
        1.0, 2.0, 3.0, 4.0, 5.0, 6.0, "L", "Y"),
    ).toDF("fname", "Provider Code", "Provider Name", "treatment_function_code",
      "treatment_function", "date", "18-26", "52-53", "104-105",
      "Total 52 plus weeks", "Total 62 plus weeks", "Total 104 plus weeks",
      "Region Code", "Area Team")
    val out = WaitTimesVintages.apr13Today(staged, "admitted")
    val cols = out.columns.toSet
    assert(cols.contains("admitted_between_18_26"))
    assert(cols.contains("admitted_between_52_plus"), s"got $cols")
    assert(!cols.exists(_.contains("52_53")), "bands at 52+ weeks are dropped")
    assert(!cols.exists(_.contains("104")), "104-week bands and totals are dropped")
    assert(!cols.exists(c => c.contains("total_62") || c.contains("region") || c.contains("area_team")))
    assert(out.collect().head.getAs[Double]("admitted_between_52_plus") == 4.0)
  }

  test("jan11 end-to-end from a real two-sheet xlsx through the Excel source") {
    import graft.sources.{SourceSpec, StagingReader}
    import org.apache.spark.sql.functions.lit
    // a realistic workbook: 2 filler rows (stand-in for the reference's 13),
    // then header + data, summary in sheet 1 and specialties in sheet 2
    val filler = Seq(Seq[Any]("Referral to Treatment", null), Seq[Any](null, null))
    val wb = graft.sources.ExcelFixtures.xlsx(Seq(
      "Provider Summary" -> (filler ++ Seq(
        Seq[Any]("org_code", "Provider Name", "95th percentile waiting time in weeks"),
        Seq[Any]("RA1", "Alpha Trust", 21.5))),
      "Provider Specialty" -> (filler ++ Seq(
        Seq[Any]("org_code", "Provider Name", "treatment_function_code",
          "treatment_function", "18-26"),
        Seq[Any]("RA1", "Alpha Trust", "AP999", "Total", 9),
        Seq[Any]("RA1", "Alpha Trust", "100", "General Surgery", 4)))))
    val dir = java.nio.file.Files.createTempDirectory("graft_rtt_xlsx").toFile
    val f = new java.io.FileOutputStream(new java.io.File(dir, "Admitted_Jan12.xlsx"))
    f.write(wb); f.close()

    val path = Seq(s"${dir.getAbsolutePath}/*.xlsx")
    val summary = StagingReader.read(spark, SourceSpec(path, format = "excel",
        excelSheet = Some("summary"), skipRows = 2, cleanNames = false))
      .withColumn("date", lit("2012-01-01"))
    val specialties = StagingReader.read(spark, SourceSpec(path, format = "excel",
        excelSheet = Some("specialty"), skipRows = 2, cleanNames = false))
      .withColumn("date", lit("2012-01-01"))

    val out = WaitTimesVintages.jan11Mar13(summary, specialties, "admitted")
    val byTfc = out.collect().map(r =>
      r.getAs[String]("treatment_function_code") ->
        Option(r.getAs[Any]("admitted_95th_percentile_waiting_time_in_weeks"))).toMap
    assert(byTfc("AP999").contains(21.5))
    assert(byTfc("100").isEmpty)
  }

  test("apr13: months without 52-plus reporting pass through unharmonised") {
    val staged = Seq(
      ("F1", "RA1", "Alpha", "100", "T", "2013-05-01", 1.0, 2.0),
    ).toDF("fname", "Provider Code", "Provider Name", "treatment_function_code",
      "treatment_function", "date", "18-26", "52-53")
    val out = WaitTimesVintages.apr13Today(staged, "admitted")
    assert(out.columns.contains("admitted_between_52_53"),
      "without total_52_plus_weeks the banding is already canonical")
  }
}
