package graft.pipelines

import java.io.FileOutputStream
import java.nio.file.Files
import graft.SparkSpec
import graft.sources.{ExcelFixtures, XlsFixtures}
import org.scalatest.funsuite.AnyFunSuite

/** The supporting-facilities E2 build replayed from REAL workbook bytes:
  * a pre-2009 All_quarters .xls (sheet per quarter, per-sheet buried
  * headers) and a modern per-quarter .xlsx flow through staging, date-var
  * derivation, per-sheet marker promotion, and the final append — ending
  * at the (year_var, quarter_var, measures) table the reference saves as
  * supporting-facilities.csv.
  */
class SupportingFacilitiesStagingSpec extends AnyFunSuite with SparkSpec {

  private def write(dir: java.io.File, name: String, bytes: Array[Byte]): Unit = {
    val f = new FileOutputStream(new java.io.File(dir, name))
    f.write(bytes); f.close()
  }

  // one quarter's sheet: a title preamble at a per-sheet depth, then the
  // marker row (the real header), then the trust rows
  private def sheet(title: String, preambleRows: Int, rows: Seq[Seq[Any]]): Seq[Seq[Any]] =
    Seq.fill(preambleRows)(Seq[Any](title)) ++
      (Seq(Seq[Any]("Org", "Number of operating theatres",
        "Of which, number of dedicated day case theatres")) ++ rows)

  private val measures = Seq("org_code", "nr_operating_theatres", "nr_day_case_theatres")

  test("All_quarters .xls + quarterly .xlsx replay end-to-end to the appended panel") {
    val dir = Files.createTempDirectory("graft_sf_stage").toFile
    // pre-2009: one workbook, one sheet per quarter (different preamble
    // depths per sheet — promotion must slice per sheet), plus a notes
    // sheet that derives no quarter and must drop
    write(dir, "All_quarters_2008.xls", XlsFixtures.xls(Seq(
      "Notes" -> Seq(Seq("definitions")),
      "June08" -> sheet("Q1 title", 1, Seq(Seq("RA1", 10, 4))),
      "Sep08" -> sheet("Q2 title", 2, Seq(Seq("RA1", 11, 5), Seq("RA2", 3, 1))),
    )))
    // modern: one file per quarter, first sheet
    write(dir, "Theatres_Quarter_2_2009.xlsx", ExcelFixtures.xlsx(Seq(
      "Data" -> sheet("title", 1, Seq(Seq("RA1", 12, 6))))))

    val glob = s"${dir.getAbsolutePath}/*.xls*"
    val panel = SupportingFacilitiesStaging.assemble(Seq(
      SupportingFacilitiesStaging.readFamily(spark,
        SupportingFacilitiesStaging.allQuartersSpec(Seq(glob)), measures),
      SupportingFacilitiesStaging.readFamily(spark,
        SupportingFacilitiesStaging.quarterlySpec(Seq(glob)), measures),
    ))

    assert(panel.columns.toSeq ==
      Seq("year_var", "quarter_var") ++ measures)
    val rows = panel.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getString(3), r.getString(4))).toSet
    assert(rows == Set(
      ("2008", "Q1", "RA1", "10", "4"),
      ("2008", "Q2", "RA1", "11", "5"),
      ("2008", "Q2", "RA2", "3", "1"),
      ("2009", "Q2", "RA1", "12", "6"),
    ), s"got $rows")
  }
}
