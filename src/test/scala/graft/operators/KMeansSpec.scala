package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class KMeansSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val S = 1000000L

  private def run(points: Seq[(Long, Seq[Float])], k: Int,
                  iterations: Int = 5): Map[Long, Int] = {
    val df = points.toDF("vec_id", "embedding")
    val got = KMeans.assign(df, "vec_id", "embedding", k, iterations)
      .as[(Long, Int)].collect().toMap
    graft.Storage.releaseAll(spark)
    got
  }

  /** Driver-side replay of the exact integer Lloyd recurrence. */
  private def reference(points: Seq[(Long, Seq[Float])], k: Int,
                        iterations: Int): Map[Long, Int] = {
    val pts = points.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * S).toLong).toArray
    }
    var cs = pts.sortBy(_._1).take(k).map(_._2)
    def nearest(x: Array[Long]): Int =
      cs.zipWithIndex.map { case (c, j) =>
        (x.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, j)
      }.min._2
    for (_ <- 1 to iterations) {
      val byCluster = pts.groupBy { case (_, x) => nearest(x) }
      cs = cs.zipWithIndex.map { case (prev, cid) =>
        byCluster.get(cid) match {
          case Some(members) =>
            val n = members.size
            Array.tabulate(prev.length)(j =>
              members.map(_._2(j)).sum / n) // toward-zero, like both engines
          case None => prev
        }
      }
    }
    pts.map { case (id, x) => id -> nearest(x) }.toMap
  }

  test("matches a driver-side integer replay on random points (incl. negatives)") {
    val rnd = new Random(7)
    val pts = (0L until 200L).map(id =>
      id -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f))
    assert(run(pts, k = 5) == reference(pts, 5, 5))
  }

  test("recovers well-separated blobs as pure clusters") {
    // Ids interleave across blobs so the k-lowest-id init seeds one
    // centroid per blob (first-k init is deterministic, not k-means++;
    // a pathological id order can seed all centroids in one blob).
    val rnd = new Random(11)
    val centers = Seq(-0.8f, 0.0f, 0.8f)
    val pts = (0 until 90).map { i =>
      val c = centers(i % 3)
      i.toLong -> Seq.fill(4)(c + rnd.nextFloat() * 0.05f)
    }
    val got = run(pts, k = 3, iterations = 10)
    def labels(blob: Int) =
      (0 until 90).filter(_ % 3 == blob).map(i => got(i.toLong)).toSet
    assert((0 until 3).forall(b => labels(b).size == 1))
    assert((0 until 3).flatMap(labels).toSet.size == 3)
  }

  test("an emptied cluster keeps its previous centroid (and replay agrees)") {
    // Two coincident low-id points seed two centroids at the same spot:
    // all mass assigns to the lower cid, the other empties immediately.
    val pts = Seq(
      0L -> Seq(0.5f, 0.5f), 1L -> Seq(0.5f, 0.5f),
      2L -> Seq(0.51f, 0.5f), 3L -> Seq(-0.5f, -0.5f))
    assert(run(pts, k = 2) == reference(pts, 2, 5))
  }

  test("equidistant points break ties to the lowest centroid id") {
    // ±0.25 is exactly representable in float, so the scaled coords are
    // exactly ±250000 and 0.0 is EXACTLY equidistant (0.4f would not be:
    // its double widening floors asymmetrically).
    val pts = Seq(0L -> Seq(-0.25f), 1L -> Seq(0.25f), 2L -> Seq(0.0f))
    val got = run(pts, k = 2, iterations = 0)
    assert(got(2L) == 0)
    assert(got == reference(pts, 2, 0))
  }

  test("native nearest-centroid is pinned to the HOF form, incl. exact ties") {
    import org.apache.spark.sql.functions.col
    val rnd = new Random(31)
    val cs: Array[Array[Long]] = Array.fill(7)(Array.fill(6)(rnd.nextLong() % 1000L))
    // random vectors plus EXACT copies of centroids 3 and 5 (distance 0
    // to two different centroids is impossible; distance ties between two
    // non-identical centroids are exercised by the mirrored pair below)
    val mirrored = Array(10L, 0L, 0L, 0L, 0L, 0L)
    val tieCs = cs ++ Array(mirrored.map(-_), mirrored)   // cid 7 and 8 equidistant from 0
    val vecs: Seq[Seq[Long]] = Seq.fill(50)(Seq.fill(6)(rnd.nextLong() % 1000L)) ++
      Seq(cs(3).toSeq, cs(5).toSeq, Seq(0L, 0L, 0L, 0L, 0L, 0L))
    val df = vecs.toDF("__x")
    val r = df.select(
      KMeans.nearestCentroid(col("__x"), tieCs).as("native"),
      KMeans.nearestCentroidBuiltin(col("__x"), tieCs).as("hof")).collect()
    r.foreach(row => assert(row.getInt(0) == row.getInt(1), row.toString))
  }

  test("broadcast nearest-centroid is pinned to the literal and HOF forms") {
    import org.apache.spark.sql.functions.col
    val rnd = new Random(43)
    val cs: Array[Array[Long]] = Array.fill(9)(Array.fill(5)(rnd.nextLong() % 1000L))
    val tied = Array(7L, 0L, 0L, 0L, 0L)
    val all = cs ++ Array(tied.map(-_), tied)
    val vecs: Seq[Seq[Long]] = Seq.fill(60)(Seq.fill(5)(rnd.nextLong() % 1000L)) ++
      Seq(cs(2).toSeq, Seq(0L, 0L, 0L, 0L, 0L))
    val b = spark.sparkContext.broadcast(all)
    val r = vecs.toDF("__x").select(
      KMeans.nearestCentroidBcast(col("__x"), b).as("bcast"),
      KMeans.nearestCentroid(col("__x"), all).as("lit"),
      KMeans.nearestCentroidBuiltin(col("__x"), all).as("hof")).collect()
    r.foreach { row =>
      assert(row.getInt(0) == row.getInt(1) && row.getInt(1) == row.getInt(2),
        row.toString)
    }
    b.destroy()
  }

  test("broadcast form keeps the expression O(1) in k; the literal form grows") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.GraftColumnBridge
    def mat(k: Int): Array[Array[Long]] =
      Array.tabulate(k)(i => Array.tabulate(64)(j => (i * 64 + j).toLong))
    def estimate(c: org.apache.spark.sql.Column): Long =
      org.apache.spark.util.SizeEstimator.estimate(GraftColumnBridge.expression(c))
    val b24 = spark.sparkContext.broadcast(mat(24))
    val b512 = spark.sparkContext.broadcast(mat(512))
    val sB24 = estimate(KMeans.nearestCentroidBcast(col("x"), b24))
    val sB512 = estimate(KMeans.nearestCentroidBcast(col("x"), b512))
    val sL24 = estimate(KMeans.nearestCentroid(col("x"), mat(24)))
    val sL512 = estimate(KMeans.nearestCentroid(col("x"), mat(512)))
    // the broadcast node is a handle: k=512 costs what k=24 costs
    assert(sB512 <= 2 * sB24,
      s"broadcast expression must stay O(1) in k: $sB24 -> $sB512")
    // the literal node embeds the matrix: 512/24 ≈ 21× more state
    assert(sL512 > 10 * sL24,
      s"literal expression should grow with k (sanity): $sL24 -> $sL512")
    // and at equal k the broadcast node is far smaller than the literal
    assert(sB512 * 10 < sL512, s"$sB512 vs $sL512")
    b24.destroy(); b512.destroy()
  }

  /** Driver-side replay of two-level Lloyd: coarse = [[reference]] at
    * k₁ = ⌈√k_total⌉, then an independent [[reference]] run inside each
    * coarse group at k₂ = min(⌈n_g/target⌉, maxK).
    */
  private def referenceTwoLevel(points: Seq[(Long, Seq[Float])], target: Long,
                                iterations: Int, maxK: Int = 4096): Map[Long, (Int, Int)] = {
    val kTotal = KMeans.kForTargetClusterSize(points.size.toLong, target, maxK)
    val k1 = math.ceil(math.sqrt(kTotal.toDouble)).toInt
    val coarse = reference(points, k1, iterations)
    points.groupBy { case (id, _) => coarse(id) }.flatMap { case (g, members) =>
      val ng = members.size.toLong
      val k2 = math.min(math.ceil(ng.toDouble / target).toLong, maxK.toLong).toInt
      val fine = reference(members, k2, iterations)
      members.map { case (id, _) => id -> (g, fine(id)) }
    }
  }

  test("two-level assignment matches the per-group driver replay") {
    val rnd = new Random(17)
    val pts = (0L until 300L).map(id =>
      id -> Seq.fill(6)(rnd.nextFloat() * 2f - 1f))
    val df = pts.toDF("vec_id", "embedding")
    val got = KMeans.assignTwoLevel(df, "vec_id", "embedding",
      targetClusterSize = 20L, iterations = 4)
      .as[(Long, Int, Int, Long)].collect()
    graft.Storage.releaseAll(spark)
    val want = referenceTwoLevel(pts, target = 20L, iterations = 4)
    assert(got.map(r => r._1 -> ((r._2, r._3))).toMap == want)
    // the combined label is the injective coarse·maxK + fine encoding
    got.foreach { case (_, c, f, lbl) => assert(lbl == c.toLong * 4096L + f) }
  }

  test("two-level assignment is partitioning-invariant") {
    val rnd = new Random(29)
    val pts = (0L until 240L).map(id =>
      id -> Seq.fill(4)(rnd.nextFloat() * 2f - 1f))
    val df = pts.toDF("vec_id", "embedding")
    val a = KMeans.assignTwoLevel(df, "vec_id", "embedding", 15L, iterations = 3)
      .as[(Long, Int, Int, Long)].collect().toSet
    graft.Storage.releaseAll(spark)
    val b = KMeans.assignTwoLevel(df.repartition(7), "vec_id", "embedding",
      15L, iterations = 3)
      .as[(Long, Int, Int, Long)].collect().toSet
    graft.Storage.releaseAll(spark)
    assert(a == b)
  }

  test("two-level keeps the pair space linear with √k-bounded per-point cost") {
    val rnd = new Random(37)
    val n = 2000L
    val pts = (0L until n).map(id => id -> Seq.fill(4)(rnd.nextFloat() * 2f - 1f))
    val df = pts.toDF("vec_id", "embedding")
    val asg = KMeans.assignTwoLevel(df, "vec_id", "embedding",
      targetClusterSize = 100L, iterations = 5)
    val sizes = asg.groupBy("cluster").count().as[(Long, Long)].collect().map(_._2)
    graft.Storage.releaseAll(spark)
    assert(sizes.sum == n)
    val pairSpace = sizes.map(c => c * c).sum
    assert(pairSpace <= 6 * n * 100,
      s"pair space $pairSpace exceeds 6·n·target")
    assert(pairSpace < n * n / 4)
  }

  test("saveModel/loadModel round-trips exactly; served assignment ≡ fit") {
    val rnd = new Random(11)
    val pts = (0L until 150L).map(id =>
      id -> Seq.fill(6)(rnd.nextFloat() * 2f - 1f))
    val df = pts.toDF("vec_id", "embedding")
    val (_, cs) = KMeans.fit(df, "vec_id", "embedding", k = 4, iterations = 3)
    dropTable("graft_test_kmeans_model")
    KMeans.saveModel(spark, cs, S, "graft_test_kmeans_model")
    val (loaded, scale) = KMeans.loadModel(spark, "graft_test_kmeans_model")
    assert(scale == S)
    assert(loaded.map(_.toSeq).toSeq == cs.map(_.toSeq).toSeq)
    val served = KMeans.assignFromStore(spark, "graft_test_kmeans_model",
      df, "vec_id", "embedding").as[(Long, Int)].collect().toMap
    val fitAsg = KMeans.assign(df, "vec_id", "embedding", k = 4,
      iterations = 3).as[(Long, Int)].collect().toMap
    assert(served == fitAsg)
    // re-save over the existing table (the dropTableAndStaleLocation path)
    KMeans.saveModel(spark, cs.take(2), S, "graft_test_kmeans_model")
    assert(KMeans.loadModel(spark, "graft_test_kmeans_model")._1.length == 2)
    dropTable("graft_test_kmeans_model")
    graft.Storage.releaseAll(spark)
  }

  test("kForTargetClusterSize: ceil, clamps, oracle-parity arithmetic") {
    assert(KMeans.kForTargetClusterSize(5000, 2500) == 2)
    assert(KMeans.kForTargetClusterSize(5001, 2500) == 3)
    assert(KMeans.kForTargetClusterSize(1, 2500) == 1)
    assert(KMeans.kForTargetClusterSize(0, 2500) == 1)
    assert(KMeans.kForTargetClusterSize(100000000L, 10, maxK = 4096) == 4096)
    // the SemDeDup-paper shape: 100M points, target 1e4 → k ≈ 10k
    assert(KMeans.kForTargetClusterSize(100000000L, 10000, maxK = 100000) == 10000)
  }

  test("derived k bounds the SemDeDup pair space on a mega input") {
    // 2000 spread points in ONE notional corpus: at fixed k=1 the pair
    // space would be n(n-1)/2 ≈ 2.0M. assignAuto derives k = ceil(n/100)
    // = 20, and Lloyd on spread data splits the mass so Σ n_c² stays
    // within a small multiple of n · target — the linear-in-n contract
    // semDedup's scaladoc documents.
    val rnd = new Random(23)
    val pts = (0L until 2000L).map(id => id -> Seq.fill(4)(rnd.nextFloat() * 2f - 1f))
    val df = pts.toDF("vec_id", "embedding")
    val asg = KMeans.assignAuto(df, "vec_id", "embedding",
      targetClusterSize = 100L, iterations = 5)
    val sizes = asg.groupBy("cluster").count()
      .as[(Int, Long)].collect().map(_._2)
    graft.Storage.releaseAll(spark)
    val n = 2000L
    val pairSpace = sizes.map(c => c * c).sum
    assert(sizes.sum == n)
    assert(sizes.length > 10, s"derived k should split the corpus, got ${sizes.length} clusters")
    assert(pairSpace <= 4 * n * 100,
      s"pair space $pairSpace exceeds 4·n·target — clustering failed to bound the quadratic")
    assert(pairSpace < n * n / 4, "pair space must be far below the all-pairs square")
  }
}
