package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** SQ8 invariants: fit ranges and codes match a driver replay (including
  * the constant-dimension and boundary cases), search matches the
  * code-domain brute force with the lowest-id tiebreak, and an exact
  * near-duplicate vector wins the top spot. The independent end-to-end
  * check is the q187 oracle.
  */
class ScalarQuantizerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // dim 3; dimension 2 is CONSTANT (range 0 → code 0 everywhere);
  // vec 1 is a near-duplicate of vec 0
  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    (0L, Seq(0.10f, 0.90f, 0.5f)),
    (1L, Seq(0.11f, 0.89f, 0.5f)),
    (2L, Seq(0.90f, 0.10f, 0.5f)),
    (3L, Seq(0.50f, 0.50f, 0.5f)),
    (4L, Seq(0.10f, 0.90f, 0.5f))) // exact copy of the query

  private val scale = 1000000L
  private val levels = 256

  private def replay(queryId: Long, topK: Int): Seq[(Long, Long)] = {
    val pts = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * scale).toLong).toArray }
    val dim = 3
    val mins = Array.tabulate(dim)(j => pts.map(_._2(j)).min)
    val maxs = Array.tabulate(dim)(j => pts.map(_._2(j)).max)
    def code(v: Array[Long], j: Int): Long =
      if (maxs(j) == mins(j)) 0L
      else math.min(math.max((v(j) - mins(j)) * (levels - 1) / (maxs(j) - mins(j)), 0L),
        (levels - 1).toLong)
    val q = pts.find(_._1 == queryId).get._2
    pts.filter(_._1 != queryId).map { case (id, v) =>
      id -> (0 until dim).map(j => { val d = code(v, j) - code(q, j); d * d }).sum
    }.sortBy { case (id, d) => (d, id) }.take(topK)
  }

  test("sqTopK matches the driver replay; constant dims code to zero; copy wins") {
    val got = ScalarQuantizer.sqTopK(vecs.toDF("vec_id", "embedding"),
      "vec_id", "embedding", dim = 3, queryId = 0L, topK = 4)
      .as[(Long, Long)].collect().toSeq
    graft.Storage.releaseAll(spark)
    assert(got == replay(0L, 4))
    assert(got.head == ((4L, 0L))) // the exact copy at code distance 0
    assert(got(1)._1 == 1L) // the near-dup next
  }

  test("fit collects exact per-dimension ranges; extreme points hit the code boundary") {
    val df = vecs.toDF("vec_id", "embedding")
    val m = ScalarQuantizer.fit(df, "vec_id", "embedding", dim = 3)
    graft.Storage.releaseAll(spark)
    // 0.9f widens to 0.89999997… — floor lands one under the round number
    // (and DuckDB's float→double widening matches, which the gate proves)
    assert(m.mins.toSeq == Seq(100000L, 100000L, 500000L))
    assert(m.maxs.toSeq == Seq(899999L, 899999L, 500000L))
    // a range-max coordinate codes to exactly levels−1, range-min to 0
    assert((m.maxs(0) - m.mins(0)) * (levels - 1) / (m.maxs(0) - m.mins(0)) == 255L)
  }
}
