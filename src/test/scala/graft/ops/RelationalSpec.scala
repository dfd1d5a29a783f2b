package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("unionByNameFill reconciles differing schemas with nulls") {
    val a = Seq((1, "x")).toDF("id", "name")
    val b = Seq((2, 3.5)).toDF("id", "score")
    val u = Relational.unionByNameFill(Seq(a, b)).orderBy("id")
    assert(u.columns.toSet == Set("id", "name", "score"))
    val rows = u.collect()
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 3.5)
  }

  test("cleanNames snake_cases and disambiguates duplicates") {
    val df = Seq((1, 2, 3, 4)).toDF("Org Code", "orgCode", "NR. Beds!", "2010 beds")
    assert(Relational.cleanNames(df).columns.toSeq ==
      Seq("org_code", "org_code_2", "nr_beds", "x2010_beds"))
  }

  test("coalesceGroups merges alternative columns, first non-null wins") {
    val df = Seq(
      (Some("A1"), None: Option[String]),
      (None: Option[String], Some("B2")),
      (Some("A3"), Some("B3")),
    ).toDF("OrgID", "Organisation Code")
    val out = Relational.coalesceGroups(df, Map("org_code" -> Seq("OrgID", "Organisation Code")))
    assert(out.columns.toSeq == Seq("org_code"))
    assert(out.as[String].collect().sorted.toSeq == Seq("A1", "A3", "B2"))
  }

  test("safeDiv: x/0, 0/0 and null all yield null, never NaN/Inf (§1.4)") {
    val df = Seq((1.0, 0.0), (0.0, 0.0), (4.0, 2.0), (Double.NaN, 1.0)).toDF("n", "d")
      .withColumn("r", Relational.safeDiv(col("n"), col("d")))
    val r = df.select("r").collect().map(x => if (x.isNullAt(0)) None else Some(x.getDouble(0)))
    assert(r(0).isEmpty && r(1).isEmpty)
    assert(r(2).contains(2.0))
    assert(r(3).exists(_.isNaN)) // NaN numerator propagates: guard is for /0 only
  }

  test("naPreservingSum: null iff all inputs null (reference A1 semantics)") {
    val df = Seq(
      ("g1", Some(1.0)), ("g1", None), ("g2", None), ("g2", None),
    ).toDF("g", "v")
    val sums = Relational.naPreservingSum(Seq("v"))
    val out = df.groupBy("g").agg(sums.head, sums.tail: _*)
      .orderBy("g").collect()
    assert(out(0).getDouble(1) == 1.0)
    assert(out(1).isNullAt(1), "all-null group must sum to null, not 0")
  }

  test("firstPerGroup is deterministic under explicit ordering") {
    val df = Seq(("a", 3, "r3"), ("a", 1, "r1"), ("b", 2, "r2")).toDF("k", "seq", "payload")
    val out = Relational.firstPerGroup(df, Seq("k"), Seq(col("seq"))).orderBy("k").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("r1", "r2"))
  }

  test("groupAnyFlag broadcasts group max to every row") {
    val df = Seq(("a", 0), ("a", 1), ("b", 0)).toDF("k", "flag")
    val out = Relational.groupAnyFlag(df, Seq("k"), col("flag"), "any_flag")
    assert(out.filter(col("k") === "a").select("any_flag").as[Int].collect().toSet == Set(1))
    assert(out.filter(col("k") === "b").select("any_flag").as[Int].collect().toSet == Set(0))
  }

  test("nullifySentinels maps markers to real nulls") {
    val df = Seq("-", "", "NULL", "NA", " ok ", "3.5").toDF("v")
      .withColumn("c", Relational.nullifySentinels(col("v")))
    assert(df.filter(col("c").isNull).count() == 4)
  }

  test("renameTolerant skips absent columns (setnames skip_absent)") {
    val df = Seq((1, 2)).toDF("a", "b")
    val out = Relational.renameTolerant(df, Map("a" -> "x", "zz" -> "never"))
    assert(out.columns.toSeq == Seq("x", "b"))
  }

  test("saltedSum equals the direct aggregation (null semantics included)") {
    val df = (1 to 200).map(i => ("hot", Some(i.toDouble))) ++
      Seq(("cold", Some(1.0)), ("allnull", None: Option[Double]))
    val data = df.toDF("k", "v")
    val direct = data.groupBy("k").agg(sum("v").as("v")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val salted = Relational.saltedSum(data, Seq("k"), Seq("v"), buckets = 7).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(direct == salted)
    assert(salted("allnull").isEmpty, "all-null groups stay null through both stages")
  }
}
