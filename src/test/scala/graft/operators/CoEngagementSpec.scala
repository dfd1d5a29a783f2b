package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Co-engagement projection invariants: matches a driver replay, the
  * per-user cap provably bites (hot user's weakest items drop before
  * pairing), the cap is a no-op when every user is under it, and the
  * support floor filters. The independent end-to-end check is q184.
  */
class CoEngagementSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // users 1,2 share items 10,11; user 3 is "hot": engages 10..15 but
  // items 14,15 only once each (they fall to the cap at m=4)
  private val log: Seq[(Long, Long)] =
    Seq(1L -> 10L, 1L -> 10L, 1L -> 11L,
      2L -> 10L, 2L -> 11L, 2L -> 11L) ++
      (10L to 13L).flatMap(i => Seq.fill(3)(3L -> i)) ++
      Seq(3L -> 14L, 3L -> 15L)

  private def replay(m: Int, minUsers: Long): Map[(Long, Long), Long] = {
    val capped = log.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((u, i), n) => (u, i, n) }
      .groupBy(_._1).toSeq.flatMap { case (u, items) =>
        items.sortBy(t => (-t._3, t._2)).take(m).map(t => (u, t._2)) }
    capped.groupBy(_._1).toSeq.flatMap { case (_, items) =>
      val is = items.map(_._2).sorted
      for (a <- is; b <- is if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= minUsers).toMap
  }

  private def run(m: Int, minUsers: Long): Map[(Long, Long), Long] =
    CoEngagement.project(log.toDF("user_id", "item").repartition(3),
      "user_id", "item", m, minUsers)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("projection matches the driver replay; cap is a no-op under the cap") {
    assert(run(100, 1) == replay(100, 1))
    // every pair of {10,11} across users 1,2,3 and the hot user's pairs
    assert(run(100, 1)((10L, 11L)) == 3L)
  }

  test("the cap bites: the hot user's weakest items never pair") {
    val capped = run(4, 1)
    assert(capped == replay(4, 1))
    // items 14,15 (count 1, ranked past m=4 for user 3) form no pairs
    assert(!capped.keys.exists { case (a, b) => a >= 14L || b >= 14L })
    // the hot user's top-4 items still pair among themselves
    assert(capped((10L, 13L)) == 1L)
  }

  test("the support floor filters single-user pairs") {
    val floored = run(100, 2)
    assert(floored == replay(100, 2))
    assert(floored.contains((10L, 11L)) && !floored.contains((10L, 13L)))
  }
}
