package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
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

  // ---- Cohen's kappa ----

  private def kappaOf(ratings: Seq[(String, String, String)]): Map[String, Row] =
    Audit.cohenKappa(ratings.toDF("g", "a", "b"), Seq("g"), col("a"), col("b"))
      .collect().map(r => r.getString(0) -> r).toMap

  test("kappa matches the hand-computed contingency table") {
    // 20 items: 10 yes-yes, 5 no-no, 3 yes-no, 2 no-yes.
    // n=20 agree=15; margins a: yes 13 / no 7, b: yes 12 / no 8;
    // chance = 13*12 + 7*8 = 212; kappa = 88/188 -> floor(88e6/188) ppm.
    val ratings =
      Seq.fill(10)(("g", "yes", "yes")) ++ Seq.fill(5)(("g", "no", "no")) ++
      Seq.fill(3)(("g", "yes", "no")) ++ Seq.fill(2)(("g", "no", "yes"))
    val r = kappaOf(ratings)("g")
    assert(r.getAs[Long]("n") == 20L && r.getAs[Long]("agree") == 15L)
    assert(r.getAs[Long]("chance") == 212L)
    assert(r.getAs[Long]("kappa_ppm") == 88000000L / 188L)
  }

  test("perfect agreement is exactly 1e6 ppm; perfect disagreement -1e6") {
    val perfect = Seq.fill(3)(("p", "x", "x")) ++ Seq.fill(2)(("p", "y", "y"))
    assert(kappaOf(perfect)("p").getAs[Long]("kappa_ppm") == 1000000L)
    val anti = Seq.fill(5)(("q", "x", "y")) ++ Seq.fill(5)(("q", "y", "x"))
    assert(kappaOf(anti)("q").getAs[Long]("kappa_ppm") == -1000000L)
  }

  test("both raters constant: kappa undefined (null), not 1") {
    val r = kappaOf(Seq.fill(4)(("c", "x", "x")))("c")
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("agree") == 4L)
    assert(r.isNullAt(r.fieldIndex("kappa_ppm")))
  }

  test("a null rating is its own class, and null group keys keep their row") {
    val df = Seq[(String, String, String)](
      (null, null, null), (null, null, null), (null, "x", "x"), (null, "x", "x"))
      .toDF("g", "a", "b")
    val out = Audit.cohenKappa(df, Seq("g"), col("a"), col("b")).collect()
    assert(out.length == 1 && out.head.isNullAt(0))
    // 2 null-null agreements + 2 x-x: margins 2/2 both sides,
    // chance = 2*2 + 2*2 = 8, kappa = (16-8)/(16-8) = 1
    assert(out.head.getAs[Long]("agree") == 4L)
    assert(out.head.getAs[Long]("chance") == 8L)
    assert(out.head.getAs[Long]("kappa_ppm") == 1000000L)
  }

  test("groups are independent: each source gets its own contingency") {
    val ratings = Seq.fill(3)(("g1", "x", "x")) ++
      Seq.fill(3)(("g2", "x", "y")) ++ Seq.fill(3)(("g2", "y", "x"))
    val got = kappaOf(ratings)
    assert(got("g1").getAs[Long]("agree") == 3L)
    assert(got("g2").getAs[Long]("agree") == 0L)
  }

  // ---- Fleiss' kappa ----

  private def fleissOf(ratings: Seq[(String, String, String, String)]): Map[String, Row] =
    Audit.fleissKappa(ratings.toDF("g", "a", "b", "c"), Seq("g"),
      Seq(col("a"), col("b"), col("c")))
      .collect().map(r => r.getString(0) -> r).toMap

  test("fleiss matches the hand-computed panel") {
    // 8 items × 3 raters: 4 unanimous-x, 2 (x,x,y), 2 unanimous-y.
    // agree_pairs = 4·3 + 2·1 + 2·3 = 20; c_x = 16, c_y = 8 ⇒ C = 320;
    // κ = (40·24 − 2·320)/(2·(576 − 320)) = 320/512 = 0.625.
    val ratings = Seq.fill(4)(("g", "x", "x", "x")) ++
      Seq.fill(2)(("g", "x", "x", "y")) ++ Seq.fill(2)(("g", "y", "y", "y"))
    val r = fleissOf(ratings)("g")
    assert(r.getAs[Long]("n") == 8L && r.getAs[Long]("agree_pairs") == 20L)
    assert(r.getAs[Long]("chance") == 320L)
    assert(r.getAs[Long]("kappa_ppm") == 625000L)
  }

  test("fleiss: unanimous panels on a mixed corpus are exactly 1e6; systematic 3-way disagreement is negative") {
    val perfect = Seq.fill(3)(("p", "x", "x", "x")) ++ Seq.fill(2)(("p", "y", "y", "y"))
    assert(fleissOf(perfect)("p").getAs[Long]("kappa_ppm") == 1000000L)
    // every panel splits three ways: P̄o = 0, P̄e = 1/3 ⇒ κ = −1/2
    val anti = Seq.fill(3)(("q", "x", "y", "z"))
    assert(fleissOf(anti)("q").getAs[Long]("kappa_ppm") == -500000L)
  }

  test("fleiss: a constant group is undefined (null); a null rating is a real category") {
    val const = fleissOf(Seq.fill(4)(("c", "x", "x", "x")))("c")
    assert(const.isNullAt(const.fieldIndex("kappa_ppm")))
    val withNulls = Seq.fill(2)(("n", null: String, null, null)) ++
      Seq.fill(2)(("n", "x", "x", "x"))
    val r = fleissOf(withNulls)("n")
    assert(r.getAs[Long]("agree_pairs") == 12L && r.getAs[Long]("chance") == 72L)
    assert(r.getAs[Long]("kappa_ppm") == 1000000L)
  }

  // ---- majority vote ----

  test("majorityVote: plurality consensus, smallest-category tie-break, per-rater accuracy") {
    // item 1: (0,0,1) → maj 0; item 2: (0,1,2) three-way tie → maj 0;
    // item 3: (2,2,2) unanimous → maj 2.
    val df = Seq((1L, "g", 0L, 0L, 1L), (2L, "g", 0L, 1L, 2L),
      (3L, "g", 2L, 2L, 2L)).toDF("id", "g", "ra", "rb", "rc")
    val got = Audit.majorityVote(df, "id", Seq("g"), Seq(
        "A" -> col("ra"), "B" -> col("rb"), "C" -> col("rc")))
      .collect().map(r => r.getString(1) -> r).toMap
    // A matches items 1,2,3; B matches 1,3; C matches 3 only
    assert(got("A").getAs[Long]("n_match") == 3L &&
      got("A").getAs[Long]("acc_ppm") == 1000000L)
    assert(got("B").getAs[Long]("n_match") == 2L &&
      got("B").getAs[Long]("acc_ppm") == 666666L)
    assert(got("C").getAs[Long]("n_match") == 1L &&
      got("C").getAs[Long]("acc_ppm") == 333333L)
    assert(got.values.forall(_.getAs[Long]("n") == 3L))
  }

  test("majorityVote: a null vote is a real category and can be the consensus") {
    val df = Seq((1L, "g", Some(1L), None, None),
      (2L, "g", Some(0L), Some(0L), Some(2L))).toDF("id", "g", "ra", "rb", "rc")
    val got = Audit.majorityVote(df, "id", Seq("g"), Seq(
        "A" -> col("ra"), "B" -> col("rb"), "C" -> col("rc")))
      .collect().map(r => r.getString(1) -> r).toMap
    // item 1's consensus is NULL (two abstains beat one vote): A matches
    // only item 2, B matches both, C matches item 1 only
    assert(got("A").getAs[Long]("n_match") == 1L)
    assert(got("B").getAs[Long]("n_match") == 2L)
    assert(got("C").getAs[Long]("n_match") == 1L)
  }
}
