package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wait-times adjustment semantics on synthetic fixtures: band re-melt,
  * cumulative percent/median re-derivation after merging, and the
  * reference's literal-band-name quirk.
  */
class WaitTimesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private val bins = Seq(
    "incomplete_between_0_1", "incomplete_between_17_18",
    "incomplete_between_18_19", "incomplete_between_52_plus")

  // m1+m2 merge into MM. Merged June: counts 30,30,20,20 (total 100):
  // cum at 17_18 = 60 → percent 0.6; median crosses 0.5 at 17_18 → 17.5
  private def panel = Seq(
    ("m1", "MRS ONE", "2019-06-01", 2019, "C_100", "General Surgery", 20.0, 10.0, 10.0, 10.0, 50.0),
    ("m2", "MRS TWO", "2019-06-01", 2019, "C_100", "General Surgery", 10.0, 20.0, 10.0, 10.0, 50.0),
    ("u1", "UNTOUCHED", "2019-06-01", 2019, "C_100", "General Surgery", 5.0, 1.0, 1.0, 1.0, 8.0),
  ).toDF("org_code", "org_name", "date", "year",
    "treatment_function_code", "treatment_function",
    bins(0), bins(1), bins(2), bins(3),
    "incomplete_total_number_of_incomplete_pathways")
    .withColumn("date", col("date").cast("date"))

  private def lookup = Seq(("m1", "MM", 0, 0), ("m2", "MM", 0, 0))
    .toDF("old_code", "final_code", "experiences_split", "problematic")

  private lazy val out = WaitTimes.adjust(panel, lookup, "incomplete", bins).cache()

  test("merged bands sum and the percent/median re-derive from cumulatives") {
    val mm = out.filter(col("org_code") === "MM").collect()
    assert(mm.length == 1)
    val r = mm(0)
    assert(r.getAs[Double]("incomplete_between_0_1") == 30.0)
    assert(r.getAs[Double]("incomplete_percent_within_18_weeks") == 0.6)
    assert(r.getAs[Double]("incomplete_average_median_waiting_time_in_weeks") == 17.5)
  }

  test("unaffected trusts keep their rows; derived columns null-filled by union") {
    val u = out.filter(col("org_code") === "u1").collect()
    assert(u.length == 1)
    assert(u(0).getAs[Double]("incomplete_between_0_1") == 5.0)
    // the fixture input had no percent column, so the union fills null
    assert(u(0).isNullAt(u(0).fieldIndex("incomplete_percent_within_18_weeks")))
  }

  test("merger change indicator lands one month after the last old period") {
    val mm = out.filter(col("org_code") === "MM").head()
    assert(mm.getAs[Int]("org_change") == 0, "June is the last OLD period")
    // the indicator points at July, which has no data row here — the flag
    // would appear on a July row if one existed
  }

  test("reference quirk: percent is derived all-null for non-incomplete pathways") {
    val admBins = bins.map(_.replace("incomplete", "admitted"))
    val admPanel = Seq(
      ("m1", "MRS ONE", "2019-06-01", 2019, "C_100", "General Surgery", 20.0, 10.0, 10.0, 10.0, 50.0),
      ("m2", "MRS TWO", "2019-06-01", 2019, "C_100", "General Surgery", 10.0, 20.0, 10.0, 10.0, 50.0),
    ).toDF("org_code", "org_name", "date", "year",
      "treatment_function_code", "treatment_function",
      admBins(0), admBins(1), admBins(2), admBins(3),
      "admitted_total_number_of_completed_pathways_all")
      .withColumn("date", col("date").cast("date"))
    val adm = WaitTimes.adjust(admPanel, lookup, "admitted", admBins)
      .filter(col("org_code") === "MM").head()
    assert(adm.isNullAt(adm.fieldIndex("admitted_percent_within_18_weeks")),
      "the literal band-name test can never match for the admitted pathway")
    assert(adm.getAs[Double]("admitted_average_median_waiting_time_in_weeks") == 17.5,
      "the median derivation is pathway-agnostic and still works")
  }
}
