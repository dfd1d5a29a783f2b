package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class KnnGraphSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { // array-order fold, the engine's dot contract
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def brute(points: Seq[(Long, Int, Seq[Float])],
                    k: Int): Set[(Long, Long, Long, Double)] =
    points.flatMap { case (id, c, v) =>
      points.filter(p => p._2 == c && p._1 != id)
        .map(p => (p._1, round6(cos(v, p._3))))
        .sortBy { case (nid, s) => (-s, nid) }
        .take(k)
        .zipWithIndex
        .map { case ((nid, s), i) => (id, (i + 1).toLong, nid, s) }
    }.toSet

  private def run(points: Seq[(Long, Int, Seq[Float])],
                  k: Int): Set[(Long, Long, Long, Double)] = {
    val df = points.toDF("vec_id", "cluster", "embedding")
    KnnGraph.clusterLocalKnn(df, "vec_id", "embedding", "cluster", k)
      .as[(Long, Long, Long, Double)].collect().toSet
  }

  test("hand case: neighbors stay within the cell, ranked by cosine") {
    val pts = Seq(
      (1L, 0, Seq(1f, 0f)),
      (2L, 0, Seq(0.9f, 0.1f)),
      (3L, 0, Seq(0f, 1f)),
      (4L, 1, Seq(1f, 0f))) // same direction as 1 but another cell
    val got = run(pts, k = 1)
    // 1's nearest cell-mate is 2 (not the identical-direction 4).
    assert(got.collect { case (1L, 1L, n, _) => n } == Set(2L))
    // 4 is alone in its cell: no rows.
    assert(!got.exists(_._1 == 4L))
  }

  test("exact ties rank by neighbor id") {
    val v = Seq(1f, 0f)
    val got = run(Seq((1L, 0, v), (2L, 0, v), (3L, 0, v)), k = 2)
    assert(got.filter(_._1 == 3L).toSeq.sortBy(_._2)
      .map(r => (r._2, r._3)) == Seq((1L, 1L), (2L, 2L)))
  }

  test("k larger than the cell emits only the cell-mates") {
    val got = run(Seq(
      (1L, 0, Seq(1f, 0f)), (2L, 0, Seq(0f, 1f)),
      (3L, 1, Seq(1f, 1f))), k = 10)
    assert(got.count(_._1 == 1L) == 1 && got.count(_._1 == 3L) == 0)
  }

  test("matches brute force on random points across several cells") {
    val rnd = new Random(41)
    val pts = (0L until 120L).map(i =>
      (i, rnd.nextInt(4), Seq.fill(6)(rnd.nextFloat() - 0.5f)))
    assert(run(pts, k = 3) == brute(pts, k = 3))
  }
}
