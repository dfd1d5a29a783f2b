package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PQ/ADC invariants: codebook shapes, encode determinism across
  * partitionings, ADC scores exactly equal to a driver-side recomputation
  * from the trained codebooks (the literal-table/element_at wiring), a
  * recall characterization on clustered data, and the TakeOrdered plan.
  * The independent end-to-end check is the q123 oracle, which replays
  * training itself.
  */
class ProductQuantizerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dim = 8
  // 5 tight clusters of 24 vectors; cluster c centers at 10·c per dim
  private lazy val vecs = (0 until 120).map { i =>
    val c = i % 5
    (i.toLong, (0 until dim).map(j =>
      10.0 * c + ((i * 7 + j * 13) % 10) * 0.05).toArray)
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  test("train: m codebooks of k centroids of dim/m coordinates") {
    val cbs = ProductQuantizer.train(df, "vec_id", "embedding", dim,
      m = 2, k = 4, iterations = 2)
    assert(cbs.length == 2)
    assert(cbs.forall(cb => cb.length == 4 && cb.forall(_.length == dim / 2)))
  }

  test("batched train ≡ m sequential per-subspace KMeans fits, bit for bit") {
    // the batched trainer shares one scan per round across the m chains;
    // every codebook must equal the per-subspace KMeans.fit it replaced
    for (m <- Seq(1, 2, 4); iters <- Seq(0, 1, 3)) {
      val batched = ProductQuantizer.train(df, "vec_id", "embedding", dim,
        m, k = 4, iterations = iters)
      val subDim = dim / m
      val reference = (0 until m).toArray.map { s =>
        val sub = df.select(col("vec_id"),
          slice(col("embedding"), s * subDim + 1, subDim).as("__sub"))
        KMeans.fit(sub, "vec_id", "__sub", 4, iters)._2
      }
      graft.Storage.releaseAll(spark)
      assert(batched.map(_.map(_.toSeq).toSeq).toSeq ==
        reference.map(_.map(_.toSeq).toSeq).toSeq, s"m=$m iters=$iters")
    }
  }

  test("encode is bit-identical across partitionings") {
    val cbs = ProductQuantizer.train(df, "vec_id", "embedding", dim,
      m = 2, k = 4, iterations = 2)
    def codes(parts: Int) =
      ProductQuantizer.encode(df.repartition(parts), "vec_id", "embedding",
          dim, cbs)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(codes(1) == codes(32))
  }

  test("ADC scores equal the driver-side recomputation from the codebooks") {
    val m = 2; val k = 4; val iters = 2; val scale = 1000000L
    val cbs = ProductQuantizer.train(df, "vec_id", "embedding", dim, m, k, iters)
    val codes = ProductQuantizer.encode(df, "vec_id", "embedding", dim, cbs)
      .collect().map(r => r.getLong(0) -> Array(r.getInt(1), r.getInt(2))).toMap
    val subDim = dim / m
    def scaled(v: Array[Double]) = v.map(x => math.floor(x * scale).toLong)
    val q = scaled(vecs.find(_._1 == 0L).get._2)
    def dist(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = vecs.filter(_._1 != 0L).map { case (id, _) =>
      id -> (0 until m).map { s =>
        dist(q.slice(s * subDim, (s + 1) * subDim), cbs(s)(codes(id)(s)))
      }.sum
    }.toMap

    val got = ProductQuantizer.adcTopK(df, "vec_id", "embedding", dim,
        m, k, iters, queryId = 0L, topK = 119)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("recall: quantized top-k recovers the true cluster neighborhood") {
    // exact L2 top-23 of query 0 are its 23 same-cluster peers
    val exact = vecs.filter(_._1 != 0L).map { case (id, v) =>
      id -> v.zip(vecs.head._2).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sortBy { case (id, d) => (d, id) }.take(23).map(_._1).toSet
    assert(exact.forall(_ % 5 == 0), "sanity: exact neighbors are cluster 0")
    val pq = ProductQuantizer.adcTopK(df, "vec_id", "embedding", dim,
        m = 2, k = 8, iterations = 3, queryId = 0L, topK = 23)
      .collect().map(_.getLong(0)).toSet
    val overlap = (exact & pq).size
    assert(overlap >= 18, s"recall too low: $overlap/23")
  }

  test("refuses a dimension that does not split into m subspaces") {
    intercept[IllegalArgumentException] {
      ProductQuantizer.train(df, "vec_id", "embedding", dim, m = 3, k = 2,
        iterations = 1)
    }
  }

  test("search terminates in TakeOrderedAndProject, never a global sort") {
    val p = ProductQuantizer.adcTopK(df, "vec_id", "embedding", dim,
        m = 2, k = 4, iterations = 1, queryId = 0L, topK = 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }
}
