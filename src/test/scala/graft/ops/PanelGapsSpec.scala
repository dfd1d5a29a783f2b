package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gap detection semantics on hand-computable panels: interior gaps only
  * (the range is [first, last] per entity — absence before first or after
  * last observation is not a gap), complete panels report zero with null
  * endpoints, multiple observations in one month collapse, and the
  * granular and report forms agree.
  */
class PanelGapsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private lazy val panel = Seq(
    // trust A: jan, feb, may (two rows), jun → gaps mar, apr
    ("A", "2020-01-15"), ("A", "2020-02-01"), ("A", "2020-05-09"),
    ("A", "2020-05-21"), ("A", "2020-06-30"),
    // trust B: complete jan..mar
    ("B", "2020-01-01"), ("B", "2020-02-28"), ("B", "2020-03-31"),
    // trust C: single observation — trivially complete
    ("C", "2021-07-04"),
    // trust D: year-crossing gap nov 2019 .. feb 2020 missing dec+jan
    ("D", "2019-11-05"), ("D", "2020-02-14"),
  ).toDF("org_code", "date").withColumn("date", col("date").cast("date"))

  private lazy val rep = PanelGaps.report(panel, Seq("org_code"), "date")
    .collect().map(r => r.getString(0) -> r).toMap

  test("interior gaps are found; month duplicates collapse") {
    val a = rep("A")
    assert(a.getLong(1) == 6 && a.getLong(2) == 4 && a.getLong(3) == 2)
    assert(a.getDate(4) == d("2020-03-01") && a.getDate(5) == d("2020-04-01"))
  }

  test("complete and single-month panels report zero gaps with null endpoints") {
    val b = rep("B")
    assert(b.getLong(1) == 3 && b.getLong(2) == 3 && b.getLong(3) == 0)
    assert(b.isNullAt(4) && b.isNullAt(5))
    val c = rep("C")
    assert(c.getLong(1) == 1 && c.getLong(3) == 0 && c.isNullAt(4))
  }

  test("gaps cross year boundaries") {
    val dd = rep("D")
    assert(dd.getLong(2) == 2 && dd.getLong(3) == 2)
    assert(dd.getDate(4) == d("2019-12-01") && dd.getDate(5) == d("2020-01-01"))
  }

  test("granular form agrees with the report counts and endpoints") {
    val g = PanelGaps.gaps(panel, Seq("org_code"), "date")
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
    assert(g.toSet == Set(
      ("A", "2020-03-01"), ("A", "2020-04-01"),
      ("D", "2019-12-01"), ("D", "2020-01-01")))
  }

  test("report is a single-shuffle plan") {
    val p = PanelGaps.report(panel, Seq("org_code"), "date")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(1200))
  }
}
