package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degree-ordered triangle counting on hand-countable graphs: complete
  * graphs, chorded rings, triangle-free stars, hub attachment, and
  * robustness to duplicate/reversed/self-loop edges. The orientation must
  * find each triangle exactly once regardless of degree skew.
  */
class TrianglesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def per(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: four triangles, every node in three") {
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val m = per(k4)
    assert(m == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("ring with chords {1,2} over 7 nodes: seven triangles, three per node") {
    // 7 is odd, so the only difference triple in ±{1,2} is 1+1=2: exactly
    // the (v, v+1, v+2) triangles — no wrap-around extras like an even ring
    val edges = (0L until 7L).flatMap(v => Seq((v, (v + 1) % 7), (v, (v + 2) % 7)))
    val m = per(edges)
    assert(m.keySet == (0L until 7L).toSet && m.values.forall(_ == 3L))
  }

  test("stars are triangle-free; empty result, global count zero") {
    val star = (1L to 20L).map(v => (0L, v))
    assert(per(star).isEmpty)
    val g = Triangles.globalCount(star.toDF("src", "dst"), "src", "dst").head()
    assert(g.getLong(0) == 0L)
  }

  test("duplicate, reversed, and self-loop edges do not change the count") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = tri ++ Seq((2L, 1L), (3L, 2L), (1L, 2L), (1L, 1L), (3L, 3L))
    assert(per(tri) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(per(noisy) == per(tri))
  }

  test("hub skew: a high-degree hub's triangles count once each") {
    // hub 0 connected to everyone; ring 1-2, 3-4: triangles (0,1,2), (0,3,4)
    val edges = (1L to 10L).map((0L, _)) ++ Seq((1L, 2L), (3L, 4L))
    val m = per(edges)
    assert(m == Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    val g = Triangles.globalCount(edges.toDF("src", "dst"), "src", "dst").head()
    assert(g.getLong(0) == 2L)
  }

  test("string-keyed graphs work through the same orientation") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst")
    val m = Triangles.perNode(edges, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("plan: equi-joins only — no cartesian, no nested loop") {
    val edges = (0L until 30L).flatMap(v => Seq((v, (v + 1) % 30), (v, (v + 3) % 30)))
    val p = Triangles.perNode(edges.toDF("src", "dst"), "src", "dst")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }
}
