package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file parity: re-derive the committed org-change-adjusted
  * supporting-facilities panel from its committed inputs and compare row
  * sets against the reference's own output CSV (SURVEY §5 strategy 3).
  */
class GoldenSupportingFacilitiesSpec extends AnyFunSuite with SparkSpec {

  private val refData = "/root/reference/data"

  private def readCsv(path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "NA")
      .csv(path)

  private lazy val result: DataFrame = {
    val clean = readCsv(s"$refData/supporting-facilities/supporting-facilities_clean.csv")
      .coalesce(1) // single small file: keep file order for the row index
    val lookup = readCsv(s"$refData/org-changes/trust_lookup_uncomplicated_changes.csv")
      .withColumn("experiences_split", col("experiences_split").cast("int"))
      .withColumn("problematic", col("problematic").cast("int"))
    SupportingFacilities.adjust(clean, lookup).cache()
  }

  private lazy val golden: DataFrame = readCsv(
      s"$refData/supporting-facilities/supporting-facilities_clean_org_change_adj.csv")
    .select(
      col("year").cast("int"),
      col("quarter"),
      col("org_code"),
      col("nr_operating_theatres").cast("double"),
      col("nr_day_case_theatres").cast("double"),
      col("exp_problematic_org_change").cast("int"),
      col("org_name"),
      col("unproblematic_org_change").cast("int"),
      col("exp_unproblematic_org_change").cast("int"))
    .cache()

  test("row count matches the committed golden output") {
    assert(result.count() == golden.count())
  }

  test("every golden row is reproduced exactly (and nothing extra)") {
    val onlyGolden = golden.exceptAll(result)
    val onlyOurs = result.exceptAll(golden)
    val (g, o) = (onlyGolden.count(), onlyOurs.count())
    if (g != 0 || o != 0) {
      onlyGolden.show(10, truncate = false)
      onlyOurs.show(10, truncate = false)
    }
    assert(g == 0 && o == 0, s"golden-only rows: $g, extra rows: $o")
  }
}
