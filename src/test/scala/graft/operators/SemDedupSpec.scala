package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(points: Seq[(Long, Int, Seq[Float])],
                  tau: Double = 0.9): Map[Long, Boolean] = {
    val df = points.map { case (id, c, v) => (id, c, v) }
      .toDF("vec_id", "cluster", "embedding")
    Dedup.semDedup(df, "vec_id", "embedding", "cluster", tau)
      .select("vec_id", "kept").as[(Long, Boolean)].collect().toMap
  }

  test("keep-first within a cluster: lowest id survives, near-dups drop") {
    val got = run(Seq(
      (1L, 0, Seq(1f, 0f)),
      (2L, 0, Seq(0.99f, 0.05f)), // near 1 → dropped
      (3L, 0, Seq(0f, 1f)),       // orthogonal → kept
      (4L, 0, Seq(0.05f, 0.99f))  // near 3 → dropped
    ))
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }

  test("identical vectors in DIFFERENT clusters are both kept") {
    val got = run(Seq(
      (1L, 0, Seq(1f, 0f)),
      (2L, 1, Seq(1f, 0f))))
    assert(got == Map(1L -> true, 2L -> true))
  }

  test("drop rule is per-pair, not transitive: a dropped point still drops its own near-dups") {
    // b near a (dropped); c near b but NOT near a → c still drops,
    // because the rule is "any lower-id cluster-mate above tau".
    val a = Seq(1f, 0f, 0f)
    val b = Seq(0.95f, 0.3122f, 0f) // cos(a,b) ≈ 0.95
    val c = Seq(0.81f, 0.586f, 0f)  // cos(b,c) ≈ 0.95, cos(a,c) ≈ 0.81
    val got = run(Seq((1L, 0, a), (2L, 0, b), (3L, 0, c)), tau = 0.9)
    assert(got == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("every input point appears exactly once in the output") {
    val pts = (0L until 50L).map(i =>
      (i, (i % 3).toInt, Seq(i.toFloat / 50f, 1f - i.toFloat / 50f)))
    val df = pts.toDF("vec_id", "cluster", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding", "cluster", 0.999)
    assert(out.count() == 50L)
    assert(out.select("vec_id").distinct().count() == 50L)
  }
}
