package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file parity for the org-changes chain: the pointer-doubling
  * closure must reproduce the reference's (old_code → final_code) per-path
  * resolution, and the full trust-lookup derivation must match the
  * committed lookup CSV (SURVEY §5 strategy 3).
  */
class GoldenOrgChangesSpec extends AnyFunSuite with SparkSpec {

  private def readCsv(path: String): DataFrame =
    spark.read.option("header", "true").option("nullValue", "NA").csv(path)

  private lazy val paths = readCsv(
    "/root/reference/data/org-changes/all_org_changes_paths_2000_2018.csv").cache()

  private lazy val goldenLookup = readCsv(
      "/root/reference/data/org-changes/trust_lookup_uncomplicated_changes.csv")
    .select(col("old_code"), col("final_code"),
      col("experiences_split").cast("int"), col("problematic").cast("int"))
    .cache()

  test("closure reproduces every path's final_code (with split fan-out)") {
    val expected = paths.select(col("old_code"), col("final_code")).distinct()
    val got = OrgChanges.resolved(paths)
      .join(paths.select(col("old_code")).distinct(), Seq("old_code"), "left_semi")
      .select(col("old_code"), col("final_code")).distinct()
    val missing = expected.exceptAll(got).count()
    val extra = got.exceptAll(expected).count()
    assert(missing == 0 && extra == 0, s"missing=$missing extra=$extra")
  }

  test("closure hop counts match the path lengths in the committed file") {
    val pathHops = paths.select(col("old_code"), col("final_code"),
        (when(col("new_code_1").isNotNull, 1).otherwise(0) +
         when(col("new_code_2").isNotNull, 1).otherwise(0) +
         when(col("new_code_3").isNotNull, 1).otherwise(0)).as("hops"))
      .distinct()
    val got = OrgChanges.resolved(paths)
      .join(paths.select(col("old_code")).distinct(), Seq("old_code"), "left_semi")
      .distinct()
    val missing = pathHops.exceptAll(got).count()
    assert(missing == 0, s"paths not reproduced with same hop count: $missing")
  }

  test("trust lookup derivation matches the committed lookup row set") {
    val got = OrgChanges.trustLookup(paths)
      .select(col("old_code"), col("final_code"), col("experiences_split"), col("problematic"))
    val onlyGolden = goldenLookup.exceptAll(got)
    val onlyOurs = got.exceptAll(goldenLookup)
    val (g, o) = (onlyGolden.count(), onlyOurs.count())
    if (g != 0 || o != 0) {
      onlyGolden.show(10, truncate = false); onlyOurs.show(10, truncate = false)
    }
    assert(g == 0 && o == 0, s"golden-only rows: $g, extra rows: $o")
  }
}
