package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def naive(probe: org.apache.spark.sql.DataFrame,
                    iv: org.apache.spark.sql.DataFrame): Set[(Int, String)] =
    probe.join(iv, col("t") >= col("s") && col("t") < col("e"))
      .select(col("pid"), col("ivid")).as[(Int, String)].collect().toSet

  test("bucketedContainment equals the naive range join for every bucket width") {
    val probe = Seq((1, 0L), (2, 5L), (3, 9L), (4, 10L), (5, 37L), (6, -3L))
      .toDF("pid", "t")
    val iv = Seq(("a", 0L, 10L), ("b", 5L, 6L), ("c", -5L, 40L), ("d", 30L, 31L),
        ("e", 7L, 7L)) // empty interval (end == start) must match nothing
      .toDF("ivid", "s", "e")
    val expected = naive(probe, iv)
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 2L, 7L, 100L)) {
      val got = RangeJoin.bucketedContainment(
          probe, col("t"), iv, col("s"), col("e"), bucketWidth = w)
        .select(col("pid"), col("ivid")).as[(Int, String)].collect().toSeq
      assert(got.toSet == expected, s"width=$w")
      assert(got.size == got.toSet.size, s"width=$w produced duplicate pairs")
    }
  }

  test("negative timestamps bucket with floor semantics (no off-by-one at 0)") {
    val probe = Seq((1, -1L), (2, 0L)).toDF("pid", "t")
    val iv = Seq(("x", -5L, 1L)).toDF("ivid", "s", "e")
    val got = RangeJoin.bucketedContainment(
        probe, col("t"), iv, col("s"), col("e"), bucketWidth = 10L)
      .select(col("pid"), col("ivid")).as[(Int, String)].collect().toSet
    assert(got == Set((1, "x"), (2, "x")))
  }

  test("interval spanning many buckets still matches each probe exactly once") {
    val probe = Seq((1, 50L)).toDF("pid", "t")
    val iv = Seq(("wide", 0L, 1000L)).toDF("ivid", "s", "e")
    val got = RangeJoin.bucketedContainment(
        probe, col("t"), iv, col("s"), col("e"), bucketWidth = 3L)
      .select(col("pid"), col("ivid")).collect()
    assert(got.length == 1)
  }

  test("bucketedOverlap equals the naive overlap join, each pair exactly once") {
    val a = Seq(("a1", 0L, 10L), ("a2", 5L, 6L), ("a3", -7L, -2L),
        ("a4", 90L, 200L), ("a5", 3L, 3L)) // empty: matches nothing
      .toDF("aid", "as", "ae")
    val b = Seq(("b1", 9L, 12L), ("b2", -3L, 4L), ("b3", 100L, 101L),
        ("b4", 5L, 6L), ("b5", 300L, 400L)) // disjoint from everything
      .toDF("bid", "bs", "be")
    // The bare predicate s1<e2 AND s2<e1 assumes non-empty intervals; an
    // empty [s,s) is the empty set and must match nothing, so the naive
    // reference carries the same non-emptiness guard the operator applies.
    val expected = a.filter(col("ae") > col("as"))
      .join(b.filter(col("be") > col("bs")),
        col("as") < col("be") && col("bs") < col("ae"))
      .select(col("aid"), col("bid")).as[(String, String)].collect().toSet
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 4L, 16L, 1000L)) {
      val got = RangeJoin.bucketedOverlap(a, col("as"), col("ae"),
          b, col("bs"), col("be"), bucketWidth = w)
        .select(col("aid"), col("bid")).as[(String, String)].collect().toSeq
      assert(got.toSet == expected, s"width=$w")
      assert(got.size == got.toSet.size, s"width=$w produced duplicate pairs")
    }
  }
}
