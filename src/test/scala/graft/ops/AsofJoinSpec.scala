package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "u1", 100L), // before any right row
    (2L, "u1", 205L), // after right@200
    (3L, "u1", 300L), // tie with right@300: right wins (inclusive >=)
    (4L, "u2", 500L), // other key
  ).toDF("event_id", "k", "ts")

  private def right = Seq(
    ("u1", 200L, Some(2.0)),
    ("u1", 300L, None: Option[Double]), // genuinely-null value must still win
    ("u2", 400L, Some(4.0)),
  ).toDF("k", "ts", "v")

  test("backward as-of join: latest right row at or before each left ts") {
    val out = AsofJoin.backward(left, right, Seq("k"), "ts", Seq("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L).isEmpty, "no prior right row → null")
    assert(out(2L).contains(2.0))
    assert(out(3L).isEmpty, "the tie row's null value wins over the older 2.0")
    assert(out(4L).contains(4.0))
  }

  test("rightTieCols: ts-tied right rows resolve to the highest tie value") {
    // two clicks at the SAME ts: without a tiebreak the winner is
    // partition-order-dependent; with one, the highest id wins — at every
    // input partitioning
    val probes = Seq((1L, "u1", 300L)).toDF("event_id", "k", "ts")
    val refs = Seq(("u1", 300L, 7L), ("u1", 300L, 9L), ("u1", 200L, 99L))
      .toDF("k", "ts", "click_id")
    for (np <- Seq(1, 3, 7)) {
      val got = AsofJoin.backward(probes, refs.repartition(np), Seq("k"), "ts",
          Seq("click_id"), rightTieCols = Seq("click_id"))
        .collect().map(_.getLong(3))
      assert(got.toSeq == Seq(9L), s"np=$np: ${got.toSeq}")
    }
    // tie helper columns must not leak into the output schema
    val cols = AsofJoin.backward(probes, refs, Seq("k"), "ts",
      Seq("click_id"), rightTieCols = Seq("click_id")).columns.toSeq
    assert(cols == Seq("event_id", "k", "ts", "click_id"), cols)
  }

  test("value columns must not clash with left columns") {
    assertThrows[IllegalArgumentException] {
      AsofJoin.backward(left, right.withColumnRenamed("v", "ts2")
        .withColumnRenamed("ts2", "ts"), Seq("k"), "ts", Seq("ts"))
    }
  }
}
