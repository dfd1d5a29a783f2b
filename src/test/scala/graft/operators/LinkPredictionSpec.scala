package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Link-prediction invariants: hand-checked common-neighbor counts and
  * Jaccard on a known graph, existing edges excluded, the minCommon
  * floor, and candidate generation strictly via wedges (a pair with no
  * common neighbor never appears). Independent end-to-end check: the
  * q156 oracle.
  */
class LinkPredictionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // K4 minus one edge (0-1,0-2,1-2,1-3,2-3 — missing 0-3), plus a
  // pendant 4-0, plus an isolated edge 10-11
  private lazy val edges = Seq(
    (0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L), (4L, 0L), (10L, 11L),
  ).toDF("src", "dst")

  test("the missing K4 edge is the top prediction with exact scores") {
    val got = LinkPrediction.commonNeighbors(edges, "src", "dst",
        minCommon = 1L, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // 0-3: common {1,2} = 2; deg0 = 4 (1,2,4... wait: 0 adj {1,2,4}) = 3,
    // deg3 = 2 → jaccard 2/(3+2-2) = 2/3
    assert(got((0L, 3L)) == (2L, 2.0 / 3))
    // existing edges never appear
    assert(!got.contains((0L, 1L)) && !got.contains((1L, 2L)))
    // 3-4 share neighbor 0? 3 adj {1,2}; 4 adj {0} → no common → absent
    assert(!got.contains((3L, 4L)))
    // 1-4 and 2-4 share node 0
    assert(got((1L, 4L))._1 == 1L && got((2L, 4L))._1 == 1L)
    // the isolated edge pair has no wedges at all
    assert(!got.keySet.exists(p => p._1 >= 10L))
  }

  test("minCommon floor prunes single-wedge candidates") {
    val got = LinkPrediction.commonNeighbors(edges, "src", "dst",
        minCommon = 2L, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 3L)))
  }

  test("resource allocation credits rare shared neighbors over hubs") {
    // pair (0,3) shares {1,2}: deg1 = deg2 = 3 → ra = 2·⌊S/3⌋
    val S = 1000000000000L
    val got = LinkPrediction.resourceAllocation(edges, "src", "dst",
        minCommon = 1L, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got((0L, 3L)) == (2L, 2L * (S / 3)))
    // (1,4) share only hub-ish node 0 with deg 3... 0 adj {1,2,4}: deg 3
    assert(got((1L, 4L)) == (1L, S / 3))
    assert(!got.contains((0L, 1L))) // existing edge excluded
  }

  test("plan has no cartesian product") {
    val p = LinkPrediction.commonNeighbors(edges, "src", "dst")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }
}
