package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class KCenterSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Scale = 1000000L

  private def brute(points: Seq[(Long, Seq[Float])],
                    m: Int): Seq[(Long, Long, Option[Long])] = {
    val scaled = points.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * Scale.toDouble).toLong).toArray
    }.sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var picks = Vector[(Long, Long, Option[Long])]((1L, scaled.head._1, None))
    var minD = scaled.map { case (id, v) => id -> d2(v, scaled.head._2) }.toMap
    val byId = scaled.toMap
    for (r <- 2 to m) {
      val (id, d) = minD.toSeq.sortBy { case (i, dd) => (-dd, i) }.head
      picks :+= ((r.toLong, id, Some(d)))
      minD = minD.map { case (i, dd) => i -> math.min(dd, d2(byId(i), byId(id))) }
    }
    picks
  }

  private def run(points: Seq[(Long, Seq[Float])],
                  m: Int): Seq[(Long, Long, Option[Long])] =
    KCenter.greedy(points.toDF("vec_id", "embedding"),
        "vec_id", "embedding", m)
      .as[(Long, Long, Option[Long])].collect().sortBy(_._1).toSeq

  test("hand case: picks alternate ends of a line before the middle") {
    // Points at 0, 1, 10 on a line: start at id 0 (x=0), then x=10 is
    // farthest, then x=1 (its min-dist 1e12 beats nothing else left).
    val pts = Seq(
      (0L, Seq(0f)), (1L, Seq(1f)), (2L, Seq(10f)))
    val got = run(pts, m = 3)
    assert(got.map(_._2) == Seq(0L, 2L, 1L))
    // min_dist at selection: null, (10·1e6)², (1·1e6)²
    assert(got.map(_._3) == Seq(None, Some(100000000000000L), Some(1000000000000L)))
  }

  test("argmax ties break on the lowest id") {
    val pts = Seq(
      (5L, Seq(0f)), (6L, Seq(1f)), (7L, Seq(1f)), (8L, Seq(-1f)))
    // round 2: 6, 7, 8 all at distance 1e12 → pick 6; round 3: 8 (7 is
    // now at distance 0 to pick 6's twin? no — 7 equals 6 exactly, so
    // d=0; 8 stays at 1e12).
    val got = run(pts, m = 3)
    assert(got.map(_._2) == Seq(5L, 6L, 8L))
  }

  test("m = 1 returns just the lowest id with null distance") {
    val got = run(Seq((3L, Seq(1f, 2f)), (1L, Seq(0f, 0f))), m = 1)
    assert(got == Seq((1L, 1L, None)))
  }

  test("matches brute force on random points") {
    val rnd = new Random(17)
    val pts = (0L until 150L).map(i =>
      (i, Seq.fill(5)(rnd.nextFloat() - 0.5f)))
    assert(run(pts, m = 8) == brute(pts, m = 8))
  }

  private def bruteAssign(points: Seq[(Long, Seq[Float])],
                          centerIds: Set[Long]): Set[(Long, Long, Long)] = {
    val scaled = points.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * Scale.toDouble).toLong).toArray
    }.toMap
    points.map { case (id, _) =>
      val (cid, d) = centerIds.toSeq.map { c =>
        (c, scaled(c).zip(scaled(id)).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.sortBy { case (c, d) => (d, c) }.head
      (id, cid, d)
    }.toSet
  }

  test("assign picks the nearest center with a lowest-id tiebreak") {
    val pts = Seq(
      (0L, Seq(0f)), (1L, Seq(10f)), // centers
      (2L, Seq(5f)),  // equidistant → center 0 by id tiebreak
      (3L, Seq(7f)))  // nearer 10 → center 1
    val got = KCenter.assign(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding",
        Seq(0L, 1L).toDF("vec_id"), "vec_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.collect { case (2L, c, _) => c } == Set(0L))
    assert(got.collect { case (3L, c, _) => c } == Set(1L))
    assert(got.collect { case (0L, c, d) => (c, d) } == Set((0L, 0L)))
  }

  test("assign over the greedy draw matches brute force") {
    val rnd = new Random(19)
    val pts = (0L until 120L).map(i =>
      (i, Seq.fill(4)(rnd.nextFloat() - 0.5f)))
    val df = pts.toDF("vec_id", "embedding")
    val centers = KCenter.greedy(df, "vec_id", "embedding", m = 5)
    val got = KCenter.assign(df, "vec_id", "embedding", centers, "vec_id")
      .as[(Long, Long, Long)].collect().toSet
    val centerIds = brute(pts, m = 5).map(_._2).toSet
    assert(got == bruteAssign(pts, centerIds))
  }
}
