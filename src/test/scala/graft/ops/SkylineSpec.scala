package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class SkylineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val pts = rows.groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
    pts.filter { case (x, y, _) =>
      !pts.exists { case (x2, y2, _) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.toSet
  }

  private def run(rows: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val got = Skyline.paretoFront2D(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long)].collect().toSet
    graft.Storage.releaseAll(spark)
    got
  }

  test("hand case: dominated points drop, ties on one axis resolve by the other") {
    // (5,1),(3,3),(1,5) are the front; (3,2) dominated by (3,3);
    // (5,1) twice → n_rows 2; (2,3) dominated by (3,3)
    val rows = Seq[(Long, Long)](
      (5, 1), (5, 1), (3, 3), (1, 5), (3, 2), (2, 3), (1, 1))
    assert(run(rows) == Set((5L, 1L, 2L), (3L, 3L, 1L), (1L, 5L, 1L)))
  }

  test("single point, identical points, and a totally-ordered chain") {
    assert(run(Seq((7L, 7L))) == Set((7L, 7L, 1L)))
    assert(run(Seq((2L, 2L), (2L, 2L), (2L, 2L))) == Set((2L, 2L, 3L)))
    // chain: only the top survives
    assert(run((1L to 20L).map(i => (i, i))) == Set((20L, 20L, 1L)))
  }

  test("matches brute force on random points, including negatives") {
    val rnd = new Random(13)
    val rows = Seq.fill(500)((rnd.nextInt(40).toLong - 20L,
      rnd.nextInt(40).toLong - 20L))
    assert(run(rows) == brute(rows))
  }

  test("matches brute force when many points share the max of one axis") {
    val rnd = new Random(29)
    val rows = Seq.fill(200)((rnd.nextInt(5).toLong, rnd.nextInt(100).toLong)) ++
      Seq.fill(50)((4L, 99L)) // heavy tie at a front corner
    assert(run(rows) == brute(rows))
  }
}
