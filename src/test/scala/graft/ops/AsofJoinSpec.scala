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

  test("value columns must not clash with left columns") {
    assertThrows[IllegalArgumentException] {
      AsofJoin.backward(left, right.withColumnRenamed("v", "ts2")
        .withColumnRenamed("ts2", "ts"), Seq("k"), "ts", Seq("ts"))
    }
  }
}
