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

  private val ovA = Seq(("a1", 0L, 10L), ("a2", 5L, 6L), ("a3", -7L, -2L),
      ("a4", 90L, 200L), ("a5", 3L, 3L)) // empty: matches nothing
    .toDF("aid", "as", "ae")
  private val ovB = Seq(("b1", 9L, 12L), ("b2", -3L, 4L), ("b3", 100L, 101L),
      ("b4", 5L, 6L), ("b5", 300L, 400L)) // disjoint from everything
    .toDF("bid", "bs", "be")

  // The bare predicate s1<e2 AND s2<e1 assumes non-empty intervals; an
  // empty [s,s) is the empty set and must match nothing, so the naive
  // reference carries the same non-emptiness guard the operators apply.
  private def naiveOverlap = ovA.filter(col("ae") > col("as"))
    .join(ovB.filter(col("be") > col("bs")),
      col("as") < col("be") && col("bs") < col("ae"))
    .select(col("aid"), col("bid")).as[(String, String)].collect().toSet

  test("bucketedOverlap equals the naive overlap join, each pair exactly once") {
    val expected = naiveOverlap
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 4L, 16L, 1000L)) {
      val got = RangeJoin.bucketedOverlap(ovA, col("as"), col("ae"),
          ovB, col("bs"), col("be"), bucketWidth = w)
        .select(col("aid"), col("bid")).as[(String, String)].collect().toSeq
      assert(got.toSet == expected, s"width=$w")
      assert(got.size == got.toSet.size, s"width=$w produced duplicate pairs")
    }
  }

  test("sortedOverlap equals the naive overlap join for every range count") {
    val expected = naiveOverlap
    assert(expected.nonEmpty)
    // 1 range (no cuts), a handful, and more ranges than rows (every
    // interval replicated across many near-empty ranges).
    for (np <- Seq(1, 2, 5, 64)) {
      val got = RangeJoin.sortedOverlap(ovA, col("as"), col("ae"),
          ovB, col("bs"), col("be"), numRanges = np)
        .select(col("aid"), col("bid")).as[(String, String)].collect().toSeq
      assert(got.toSet == expected, s"numRanges=$np")
      assert(got.size == got.toSet.size, s"numRanges=$np produced duplicate pairs")
    }
  }

  test("sortedOverlap matches a randomized naive join (property check)") {
    val rnd = new scala.util.Random(42)
    val xs = (1 to 300).map { i =>
      val s = rnd.nextInt(200).toLong - 100
      (s"x$i", s, s + rnd.nextInt(30).toLong) // includes empty intervals
    }
    val ys = (1 to 300).map { i =>
      val s = rnd.nextInt(200).toLong - 100
      (s"y$i", s, s + rnd.nextInt(30).toLong)
    }
    val xdf = xs.toDF("xid", "xs", "xe")
    val ydf = ys.toDF("yid", "ys", "ye")
    val expected = xdf.filter(col("xe") > col("xs"))
      .join(ydf.filter(col("ye") > col("ys")),
        col("xs") < col("ye") && col("ys") < col("xe"))
      .select(col("xid"), col("yid")).as[(String, String)].collect().toSet
    val got = RangeJoin.sortedOverlap(xdf, col("xs"), col("xe"),
        ydf, col("ys"), col("ye"), numRanges = 8)
      .select(col("xid"), col("yid")).as[(String, String)].collect().toSeq
    assert(got.toSet == expected)
    assert(got.size == got.toSet.size, "duplicate pairs emitted")
  }

  test("sortedOverlap plans no join operator and one co-partitioning exchange") {
    val plan = RangeJoin.sortedOverlap(ovA, col("as"), col("ae"),
        ovB, col("bs"), col("be"), numRanges = 4)
      .queryExecution.executedPlan.toString
    // The pairing is the per-partition sweep — there must be no Join node
    // of any kind (the raw non-equi predicate would plan a BNLJ cartesian)
    // and the one data exchange is the __rid co-partitioning. (Plain
    // "Join" would false-positive on the RangeJoin lambda's class name in
    // the MapPartitions line.)
    for (node <- Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
        "BroadcastNestedLoopJoin", "CartesianProduct"))
      assert(!plan.contains(node), plan)
    assert(plan.contains("MapPartitions"), plan)
    assert(plan.contains("hashpartitioning(__rid"), plan)
  }

  test("sortedOverlap handles empty inputs") {
    val e = ovA.filter(lit(false))
    val got = RangeJoin.sortedOverlap(e, col("as"), col("ae"),
        ovB, col("bs"), col("be"), numRanges = 4)
    assert(got.count() == 0)
    // both sides empty: the quantile pass sees an empty relation — must
    // yield an empty result, not throw
    val eb = ovB.filter(lit(false))
    assert(RangeJoin.sortedOverlap(e, col("as"), col("ae"),
      eb, col("bs"), col("be"), numRanges = 4).count() == 0)
  }

  test("sortedOverlap rejects colliding column names") {
    intercept[IllegalArgumentException] {
      RangeJoin.sortedOverlap(ovA, col("as"), col("ae"),
        ovA, col("as"), col("ae"), numRanges = 4)
    }
  }
}
