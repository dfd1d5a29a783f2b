package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AuditSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, 1, Some(10.0), Some("A")),
    (1L, 2, Some(-5.0), Some("B")),    // price violation
    (2L, 1, None, Some("A")),          // null price → violation of price>0 rule
    (2L, 1, Some(3.0), None),          // duplicate (2,1) + null flag
    (3L, 1, Some(7.0), Some("Z"))      // flag domain violation
  ).toDF("ok", "ln", "price", "flag")

  test("row checks count violations per rule in one scan; null predicate = violation") {
    val got = Audit.rowChecks(rows, Seq(
      "price_positive" -> (col("price") <= 0),
      "flag_domain" -> !col("flag").isin("A", "B")))
      .as[(String, Long)].collect().toMap
    // price: one ≤0 plus one NULL (un-evaluable expectation counts)
    assert(got == Map("price_positive" -> 2L, "flag_domain" -> 2L))
  }

  test("uniqueness counts rows beyond the first per key") {
    val got = Audit.uniqueness(rows, Seq("ok", "ln"), "key_unique")
      .as[(String, Long)].head()
    assert(got == ("key_unique", 1L))   // (2,1) appears twice
  }

  test("referential counts unresolvable children, including null keys") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val got = Audit.referential(child, "fk", parent, "pk", "fk_resolves")
      .as[(String, Long)].head()
    assert(got == ("fk_resolves", 2L))  // 9 and null
  }

  test("uniqueness treats null key components as real key values (oracle parity)") {
    // two (null, 1) rows are ONE duplicate — count(DISTINCT struct) must
    // not skip null-keyed rows the way a bare multi-column countDistinct does
    val t = Seq((Option.empty[Long], 1), (Option.empty[Long], 1), (Some(1L), 1))
      .toDF("k1", "k2")
    val got = Audit.uniqueness(t, Seq("k1", "k2"), "u").as[(String, Long)].head()
    assert(got == ("u", 1L))
  }

  test("duplicate check names are rejected up front") {
    intercept[IllegalArgumentException] {
      Audit.rowChecks(rows, Seq("a" -> lit(true), "a" -> lit(false)))
    }
  }

  test("check names are data, not SQL text: quotes and backslashes pass through") {
    // the unpivot is built with the Column API, so names that would break
    // (or inject into) a stack(...) SQL string are just literal values
    val got = Audit.rowChecks(rows, Seq(
      "bad'name" -> (col("price") <= 0),
      "trailing\\" -> lit(false),
      "a', 1L); drop--" -> lit(true)))
      .as[(String, Long)].collect().toMap
    assert(got == Map("bad'name" -> 2L, "trailing\\" -> 0L, "a', 1L); drop--" -> 5L))
  }

  test("an empty frame audits clean (zero violations, not null)") {
    val empty = rows.filter(lit(false))
    val got = Audit.report(Seq(
      Audit.rowChecks(empty, Seq("p" -> (col("price") <= 0))),
      Audit.uniqueness(empty, Seq("ok"), "u"),
      Audit.referential(empty, "ok", rows, "ok", "r")))
      .as[(String, Long)].collect().toMap
    assert(got == Map("p" -> 0L, "u" -> 0L, "r" -> 0L))
  }
}
