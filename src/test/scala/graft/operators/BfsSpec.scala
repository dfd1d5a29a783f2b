package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BFS invariants: the fixed-round min-relaxation recurrence on a hand
  * graph, bit-parity between the driver-CSR and distributed paths, the
  * hop cap's exact semantics, and the unreached-exclusion contract.
  * The independent end-to-end check is the q219 oracle (all rounds
  * unrolled in SQL).
  */
class BfsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  //   a → b → c → d → e   (chain), plus a shortcut a → d, and an
  //   isolated pair x → y unreachable from the seeds
  private val edges = Seq(
    "a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e", "a" -> "d",
    "x" -> "y")

  private def run(seeds: Seq[String], rounds: Int,
                  maxNodes: Long = 2000000L): Map[String, Long] = {
    val got = Bfs.hopDistances(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("node"), rounds, broadcastMaxNodes = maxNodes)
      .as[(String, Long)].collect().toMap
    graft.Storage.releaseAll(spark)
    got
  }

  test("hop distances follow the min-relaxation recurrence; shortcuts win") {
    // a→d direct (1 hop) beats a→b→c→d (3 hops); e is d+1
    assert(run(Seq("a"), 4) ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 1L, "e" -> 2L))
  }

  test("the round cap bounds reach exactly; unreached nodes are excluded") {
    assert(run(Seq("a"), 1) == Map("a" -> 0L, "b" -> 1L, "d" -> 1L))
    assert(run(Seq("a"), 0) == Map("a" -> 0L))
    // x/y never appear in any seed-a result
    assert(!run(Seq("a"), 10).contains("x"))
  }

  test("multi-source takes the minimum over seeds; off-graph seeds are ignored") {
    val d = run(Seq("a", "e", "zz_not_in_graph"), 4)
    assert(d("e") == 0L && d("d") == 1L && d("a") == 0L)
    assert(!d.contains("zz_not_in_graph"))
  }

  test("the distributed path is bit-identical to the driver-CSR path") {
    val rnd = new scala.util.Random(23)
    val es = (0 until 400).map(_ =>
      s"n${rnd.nextInt(60)}" -> s"n${rnd.nextInt(60)}")
    val seeds = Seq("n0", "n17")
    def runOn(maxNodes: Long): Map[String, Long] = {
      val got = Bfs.hopDistances(es.toDF("src", "dst"), "src", "dst",
          seeds.toDF("node"), rounds = 5, broadcastMaxNodes = maxNodes)
        .as[(String, Long)].collect().toMap
      graft.Storage.releaseAll(spark)
      got
    }
    val driver = runOn(2000000L)
    val distributed = runOn(1L)
    assert(driver == distributed)
    // and both match a plain driver replay of the recurrence
    var dist = Map("n0" -> 0L, "n17" -> 0L)
      .filter { case (k, _) => es.exists(e => e._1 == k || e._2 == k) }
    for (_ <- 1 to 5) {
      val stepped = es.flatMap { case (s, d0) =>
        dist.get(s).map(v => d0 -> (v + 1L)) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
      dist = (dist.keySet ++ stepped.keySet).map { k =>
        k -> math.min(dist.getOrElse(k, Long.MaxValue),
          stepped.getOrElse(k, Long.MaxValue))
      }.toMap
    }
    assert(driver == dist)
  }
}
