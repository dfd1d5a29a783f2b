package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Monthly adjustment semantics on synthetic fixtures (the reference's raw
  * inputs aren't in the snapshot): merger indicator lands one month AFTER
  * the last old-code period; split indicator on the last period itself;
  * NA-preserving sums; percent edge policy.
  */
class CriticalCareSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def panel = Seq(
    // m1+m2 merge into MM; last old rows in 2019-03 → indicator at 2019-04
    ("m1", "2019-02-01", "February", "2019", "3", "2", "0", "M ONE"),
    ("m1", "2019-03-01", "March", "2019", "4", "0", "1", "M ONE"),
    ("m2", "2019-03-01", "March", "2019", null, null, "0", "M TWO"),
    ("MM", "2019-04-01", "April", "2019", "8", "5", "0", "MERGED"),
    ("u1", "2019-02-01", "February", "2019", "5", "5", "0", "UNTOUCHED"),
  ).toDF("org_code", "date", "month", "year",
    "number_of_adult_critical_care_beds_open",
    "number_of_adult_critical_care_beds_occupied",
    "number_of_non_medical_critical_care_transfers", "org_name")
    .withColumn("number_of_paediatric_intensive_care_beds_open", lit(null).cast("string"))
    .withColumn("number_of_paediatric_intensive_care_beds_occupied", lit(null).cast("string"))
    .withColumn("number_of_neonatal_critical_care_cots_or_beds_open", lit(null).cast("string"))
    .withColumn("number_of_neonatal_critical_care_cots_or_beds_occupied", lit(null).cast("string"))

  private def lookup = Seq(("m1", "MM", 0, 0), ("m2", "MM", 0, 0))
    .toDF("old_code", "final_code", "experiences_split", "problematic")

  private lazy val out = CriticalCare.adjust(panel, lookup).cache()

  test("merger rows aggregate with NA-preserving sums and recomputed percents") {
    val mar = out.filter(col("org_code") === "MM" && col("date") === d("2019-03-01")).collect()
    assert(mar.length == 1)
    assert(mar(0).getAs[Double]("number_of_adult_critical_care_beds_open") == 4.0)
    assert(mar(0).getAs[Double]("adult_critical_care_beds_percent_occupied") == 0.0)
    val feb = out.filter(col("org_code") === "MM" && col("date") === d("2019-02-01")).head()
    assert(feb.getAs[Double]("adult_critical_care_beds_percent_occupied") == 2.0 / 3.0)
    // paediatric all-null merge stays null, and its percent stays null
    assert(mar(0).isNullAt(mar(0).fieldIndex("number_of_paediatric_intensive_care_beds_open")))
    assert(mar(0).isNullAt(mar(0).fieldIndex("paediatric_intensive_care_beds_percent_occupied")))
  }

  test("merger change indicator lands one month after the last old period") {
    val apr = out.filter(col("org_code") === "MM" && col("date") === d("2019-04-01")).collect()
    assert(apr.length == 1)
    assert(apr(0).getAs[Int]("unproblematic_org_change") == 1,
      "2019-04 is the first period under the new arrangement")
    val mar = out.filter(col("org_code") === "MM" && col("date") === d("2019-03-01")).head()
    assert(mar.getAs[Int]("unproblematic_org_change") == 0)
    assert(mar.getAs[Int]("exp_unproblematic_org_change") == 1)
  }

  test("split change indicator lands on the last pre-change period itself") {
    val splitPanel = Seq(
      ("s1", "2019-03-01", "March", "2019", "2", "1", "0", "SPLITTER"),
      ("sa", "2019-03-01", "March", "2019", "1", "1", "0", "PART A"),
      ("sa", "2019-04-01", "April", "2019", "1", "1", "0", "PART A"),
    ).toDF("org_code", "date", "month", "year",
      "number_of_adult_critical_care_beds_open",
      "number_of_adult_critical_care_beds_occupied",
      "number_of_non_medical_critical_care_transfers", "org_name")
      .withColumn("number_of_paediatric_intensive_care_beds_open", lit(null).cast("string"))
      .withColumn("number_of_paediatric_intensive_care_beds_occupied", lit(null).cast("string"))
      .withColumn("number_of_neonatal_critical_care_cots_or_beds_open", lit(null).cast("string"))
      .withColumn("number_of_neonatal_critical_care_cots_or_beds_occupied", lit(null).cast("string"))
    // backwards-merger coding for splits: lookup rows sa -> s1? No — clean
    // splits arrive pre-swapped by build_trust_lookup; model one: sa -> s1
    val splitLookup = Seq(("sa", "s1", 1, 0))
      .toDF("old_code", "final_code", "experiences_split", "problematic")
    val o = CriticalCare.adjust(splitPanel, splitLookup)
    val hit = o.filter(col("unproblematic_org_change") === 1).collect()
    assert(hit.length == 1)
    assert(hit(0).getAs[String]("org_code") == "s1")
    assert(hit(0).getAs[java.sql.Date]("date") == d("2019-04-01"),
      "split indicator = max(date) of the re-keyed chain, un-shifted")
  }

  test("untouched trusts pass through with zero flags") {
    val u = out.filter(col("org_code") === "u1").head()
    assert(u.getAs[Double]("number_of_adult_critical_care_beds_open") == 5.0)
    assert(u.getAs[Int]("unproblematic_org_change") == 0)
    assert(u.getAs[Int]("exp_unproblematic_org_change") == 0)
  }
}
