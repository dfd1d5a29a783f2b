package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SnapshotDiffSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("classifies added, removed, changed; drops unchanged; nulls compare null-safely") {
    val before = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), Some(2.0)),
      (3L, None: Option[String], Some(3.0)),
      (4L, Some("d"), None: Option[Double])).toDF("k", "s", "v")
    val after = Seq(
      (1L, Some("a"), Some(1.0)),                 // unchanged → absent
      (2L, Some("b"), Some(2.5)),                 // changed value
      (3L, Some("c"), Some(3.0)),                 // null → value = changed
      (5L, Some("e"), Some(5.0))).toDF("k", "s", "v")  // added; 4 removed
    val got = SnapshotDiff.diff(before, after, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "changed", 3L -> "changed", 4L -> "removed", 5L -> "added"))
  }

  test("identical snapshots diff to empty; key-only tables still classify add/remove") {
    val t = Seq((1L, "x"), (2L, "y")).toDF("k", "s")
    assert(SnapshotDiff.diff(t, t, Seq("k")).count() == 0)
    val ka = Seq(Tuple1(1L), Tuple1(2L)).toDF("k")
    val kb = Seq(Tuple1(2L), Tuple1(3L)).toDF("k")
    val got = SnapshotDiff.diff(ka, kb, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 3L -> "added"))
  }

  test("composite keys diff per full key") {
    val a = Seq((1L, 1, "x"), (1L, 2, "y")).toDF("k1", "k2", "s")
    val b = Seq((1L, 1, "x"), (1L, 3, "z")).toDF("k1", "k2", "s")
    val got = SnapshotDiff.diff(a, b, Seq("k1", "k2"))
      .as[(Long, Int, String)].collect().toSet
    assert(got == Set((1L, 2, "removed"), (1L, 3, "added")))
  }
}
