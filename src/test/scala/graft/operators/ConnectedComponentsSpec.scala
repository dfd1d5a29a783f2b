package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val got = ConnectedComponents.components(edges.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    graft.Storage.releaseAll(spark)
    got
  }

  test("components resolve to the minimum id, across chain/triangle/singleton-edge") {
    val got = cc(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),   // chain
      (10L, 11L), (11L, 12L), (12L, 10L), // triangle
      (20L, 21L)))                    // single edge
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("a long chain converges to one component (fixpoint, not a fixed round count)") {
    val n = 60L
    val got = cc((1L until n).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to n).toSet)
  }

  test("edge direction and duplication do not matter") {
    val a = cc(Seq((5L, 9L), (9L, 5L), (5L, 9L), (7L, 9L)))
    assert(a == Map(5L -> 5L, 7L -> 5L, 9L -> 5L))
  }
}
