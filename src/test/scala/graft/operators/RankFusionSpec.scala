package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class RankFusionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fuse(lists: Seq[Seq[(Long, Double)]], kRrf: Int = 60,
                   topK: Int = 10): Seq[(Long, Double)] = {
    val dfs = lists.map(_.toDF("id", "score"))
    RankFusion.rrf(dfs, "id", "score", kRrf, topK)
      .as[(Long, Double)].collect().toSeq
  }

  /** Driver-side replay: same rank rule, same left-fold sum order. */
  private def reference(lists: Seq[Seq[(Long, Double)]], kRrf: Int,
                        topK: Int): Seq[(Long, Double)] = {
    val ranked = lists.map(_.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), r) => id -> (1.0 / (kRrf + r + 1)) }
      .toMap)
    val ids = ranked.flatMap(_.keys).distinct
    ids.map { id =>
      id -> ranked.foldLeft(0.0)((acc, m) => acc + m.getOrElse(id, 0.0))
    }.sortBy { case (id, s) => (-s, id) }.take(topK)
  }

  test("matches a driver-side replay on overlapping lists") {
    val lex = Seq(1L -> 9.0, 2L -> 7.5, 3L -> 3.2, 4L -> 1.1)
    val sem = Seq(3L -> 0.9, 5L -> 0.8, 1L -> 0.7)
    assert(fuse(Seq(lex, sem)) == reference(Seq(lex, sem), 60, 10))
  }

  test("a doc ranked mid-list in BOTH lists outranks a single-list top hit") {
    // the defining RRF property at k=1: 1/(1+2) + 1/(1+2) > 1/(1+1)
    val a = Seq(10L -> 5.0, 7L -> 4.0, 20L -> 1.0)
    val b = Seq(30L -> 5.0, 7L -> 4.0, 40L -> 1.0)
    val got = fuse(Seq(a, b), kRrf = 1, topK = 1)
    assert(got.head._1 == 7L)
  }

  test("score ties rank by id; disjoint lists contribute independent terms") {
    val a = Seq(2L -> 1.0, 1L -> 1.0)  // tie → id 1 gets rank 1
    val b = Seq(9L -> 0.5)
    val got = fuse(Seq(a, b), kRrf = 60, topK = 3).toMap
    assert(got(1L) == 1.0 / 61 && got(2L) == 1.0 / 62 && got(9L) == 1.0 / 61)
  }

  test("single list degenerates to its own ranking") {
    val a = Seq(5L -> 0.2, 6L -> 0.9)
    assert(fuse(Seq(a)).map(_._1) == Seq(6L, 5L))
  }

  test("duplicate ids within a list collapse to their best score before ranking") {
    // a retriever emitting one row per matching chunk must not let one
    // doc occupy several rank slots or fan out the fold join
    val withDups = Seq(1L -> 0.9, 1L -> 0.5, 2L -> 0.7)
    val clean = Seq(1L -> 0.9, 2L -> 0.7)
    assert(fuse(Seq(withDups)) == fuse(Seq(clean)))
    assert(fuse(Seq(withDups, withDups)).map(_._1).distinct.size ==
      fuse(Seq(withDups, withDups)).size)
  }

  test("randomized parity with the driver replay across list counts and shapes") {
    val rnd = new scala.util.Random(41)
    (1 to 5).foreach { trial =>
      val nLists = 1 + rnd.nextInt(3)
      val lists = Seq.fill(nLists) {
        val n = 1 + rnd.nextInt(25)
        // duplicate scores on purpose: the id tiebreak must keep ranks total
        Seq.fill(n)(rnd.nextInt(40).toLong -> (rnd.nextInt(5) / 4.0))
          .distinctBy(_._1)
      }
      val kRrf = 1 + rnd.nextInt(80)
      val topK = 1 + rnd.nextInt(12)
      assert(fuse(lists, kRrf, topK) == reference(lists, kRrf, topK),
        s"trial $trial: lists=$lists kRrf=$kRrf topK=$topK")
    }
  }
}
