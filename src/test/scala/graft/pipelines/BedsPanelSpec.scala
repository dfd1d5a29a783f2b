package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Overnight+day beds 2000–24 assembly: the reference's output is a
  * stripped blob, so instead of golden rows this pins the pipeline's
  * invariants on the real committed inputs.
  */
class BedsPanelSpec extends AnyFunSuite with SparkSpec {

  private val refData = "/root/reference/data"

  private def readCsv(path: String): DataFrame =
    spark.read.option("header", "true").option("nullValue", "NA").csv(path)

  private lazy val result: DataFrame = {
    val b1024 = readCsv(s"$refData/available-and-occupied-beds/overnight_day_beds_2010_24_clean.csv")
      .coalesce(1)
    val b0010 = readCsv(s"$refData/available-and-occupied-beds/overnight_day_beds_2000_10_clean.csv")
      .coalesce(1)
    val lookup = readCsv(s"$refData/org-changes/trust_lookup_uncomplicated_changes.csv")
      .withColumn("experiences_split", col("experiences_split").cast("int"))
      .withColumn("problematic", col("problematic").cast("int"))
    OvernightBeds.assembleAdjusted(b1024, b0010, lookup).cache()
  }

  test("panel has unique (org_code, year, quarter, period_end) grain") {
    // the 2000-10 input itself carries duplicated junk rows with org_code
    // "NA" (null after na-mapping); they pass through unmerged exactly as in
    // the reference, so the grain invariant applies to real codes only
    val dup = result.filter(col("org_code").isNotNull)
      .groupBy("org_code", "year", "quarter", "period_end")
      .count().filter(col("count") > 1)
    assert(dup.count() == 0)
  }

  test("non-problematic bed totals are conserved through the adjustment") {
    val b1024 = readCsv(s"$refData/available-and-occupied-beds/overnight_day_beds_2010_24_clean.csv")
    val b0010 = readCsv(s"$refData/available-and-occupied-beds/overnight_day_beds_2000_10_clean.csv")
    val before = b1024.agg(sum(col("total_on_beds_available").cast("double"))).head().getDouble(0) +
      b0010.agg(sum(col("total_on_beds_available").cast("double"))).head().getDouble(0)
    val after = result.agg(sum(col("total_on_beds_available"))).head().getDouble(0)
    assert(math.abs(before - after) < 1e-6,
      s"merger re-keying must conserve totals: before=$before after=$after")
  }

  test("no NaN percents; quarterly rows carry quarters, annual rows don't") {
    val pctCols = result.columns.filter(_.endsWith("percent_occupied"))
    pctCols.foreach { c =>
      assert(result.filter(isnan(col(c))).count() == 0, s"NaN escaped in $c")
    }
    assert(result.filter(col("quarter").isNull && col("year") >= 2011).count() == 0,
      "2011+ rows come from the quarterly vintage")
    assert(result.filter(col("quarter").isNotNull && col("year") < 2010).count() == 0,
      "pre-2010 rows are annual")
  }

  test("vintage fill: day-bed detail is null for annual rows, present for quarterly") {
    val annual = result.filter(col("year") === 2005)
    assert(annual.filter(col("general_acute_day_beds_available").isNotNull).count() == 0,
      "2000-10 vintage has no day-bed detail columns")
    val quarterly = result.filter(col("year") === 2015)
    assert(quarterly.filter(col("general_acute_day_beds_available").isNotNull).count() > 0)
  }

  test("change flags behave: merged trusts flagged, problematic never merged") {
    // every trust appearing as a clean-change old_code must be absent
    // (its rows re-keyed to the final code)
    val lookup = readCsv(s"$refData/org-changes/trust_lookup_uncomplicated_changes.csv")
    val cleanOld = lookup.filter(col("problematic") === "0").select(col("old_code"))
    val leakedOld = result.join(cleanOld,
      result("org_code") === cleanOld("old_code"), "left_semi")
    assert(leakedOld.count() == 0, "old codes of clean changes must be re-keyed away")
    val flagged = result.filter(col("exp_unproblematic_org_change") === 1)
    assert(flagged.count() > 0, "some trusts experienced unproblematic changes")
  }
}
