package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden round-trip for the full paths derivation
  * (build_all_org_changes.R:62-231): the successor edge list is
  * reconstructed from the committed paths CSV's hop columns (696 distinct
  * edges — every edge of every chain appears in some committed original
  * path), re-derived with [[OrgChangePaths.derivePaths]], and ALL columns
  * of all 677 committed rows must match — hop codes, per-hop dates,
  * refined change types, and the four classification columns.
  */
class GoldenDerivePathsSpec extends AnyFunSuite with SparkSpec {

  private def readCsv(path: String): DataFrame =
    spark.read.option("header", "true").option("nullValue", "NA").csv(path)

  private lazy val golden = readCsv(
    "/root/reference/data/org-changes/all_org_changes_paths_2000_2018.csv").cache()

  private lazy val edges = (1 to 3).map { i =>
    golden.filter(col(s"new_code_$i").isNotNull)
      .select(col(s"new_code_${i - 1}").as("old_code"),
        col(s"new_code_$i").as("new_code"),
        to_date(col(s"date_change_$i")).as("change_date"))
  }.reduce(_ union _).distinct()

  private val allCols = Seq("old_code", "new_code_0",
    "new_code_1", "date_change_1", "change_type_1",
    "new_code_2", "date_change_2", "change_type_2",
    "new_code_3", "date_change_3", "change_type_3",
    "final_code", "experiences_split", "direct_path_complicated",
    "adjacent_to_complicated", "part_of_complicated_path")

  test("derivePaths reproduces all 677 committed rows, every column") {
    val expected = golden.select(
      allCols.map {
        case c if c.startsWith("date_change") => to_date(col(c)).as(c)
        case c @ ("experiences_split" | "adjacent_to_complicated" |
                  "part_of_complicated_path") => col(c).cast("int").as(c)
        case c => col(c)
      }: _*)
    val got = OrgChangePaths.derivePaths(edges).select(allCols.map(col): _*)
    assert(got.count() == 677)
    val onlyGolden = expected.exceptAll(got)
    val onlyOurs = got.exceptAll(expected)
    val (g, o) = (onlyGolden.count(), onlyOurs.count())
    if (g != 0 || o != 0) {
      onlyGolden.show(10, truncate = false); onlyOurs.show(10, truncate = false)
    }
    assert(g == 0 && o == 0, s"golden-only rows: $g, extra rows: $o")
  }

  test("derived classification distribution matches the committed counts") {
    val got = OrgChangePaths.derivePaths(edges)
    val dist = got.groupBy(col("direct_path_complicated")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist == Map("no" -> 640L, "split_from_multiple" -> 32L,
      "later_name_change" -> 3L, "later_merger" -> 2L))
    assert(got.filter(col("part_of_complicated_path") === 1).count() == 139)
    assert(got.filter(col("experiences_split") === 1).count() == 110)
  }
}
