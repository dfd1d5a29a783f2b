package graft.ops

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Sorted-neighborhood invariants: matches a driver replay of the
  * position-window candidate set, the window bound provably loses
  * far-apart pairs (the documented merge/purge trade), and results are
  * invariant to input partitioning. The independent end-to-end check is
  * the q192 oracle.
  */
class SortedNeighborhoodSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // sorted by key: aaa1 aaa2 aab1 mmm1 mmm2 zzz1; "aaa1"/"aab1" are
  // 2 positions apart (in window at w=3), "aaa1"/"mmm2" are far apart
  private val recs: Seq[(Long, String)] = Seq(
    (1L, "aaa1"), (2L, "aaa2"), (3L, "aab1"),
    (4L, "mmm1"), (5L, "mmm2"), (6L, "zzz1"))

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def replay(w: Int, maxLev: Int): Set[(Long, Long, Long)] = {
    val sorted = recs.sortBy { case (id, k) => (k, id) }
    (for {
      i <- sorted.indices; j <- (i + 1) until math.min(i + w, sorted.size)
      l = lev(sorted(i)._2, sorted(j)._2) if l <= maxLev
    } yield (sorted(i)._1, sorted(j)._1, l.toLong)).toSet
  }

  private def run(w: Int, maxLev: Int, np: Int = 1): Set[(Long, Long, Long)] = {
    val got = SortedNeighborhood.candidates(
      recs.toDF("id", "k").repartition(np), "id", "k", w, maxLev)
      .as[(Long, Long, Long)].collect().toSet
    graft.Storage.releaseAll(spark)
    got
  }

  test("candidates match the driver replay at several windows and partitionings") {
    for (w <- Seq(2, 3, 6); np <- Seq(1, 4))
      assert(run(w, 2, np) == replay(w, 2), s"w=$w np=$np")
  }

  test("multi-pass: the reversed-key pass recovers a leading-character error") {
    import org.apache.spark.sql.functions.{col, reverse}
    // "xmith123" vs "smith123": the leading-char error scatters them in
    // the forward sort (t*/u* records in between), but their REVERSALS
    // ("321htimx"/"321htims") sort adjacent
    val recs = Seq((1L, "smith123"), (2L, "xmith123"),
      (3L, "mmmm"), (4L, "mmmn"), (5L, "tttt"), (6L, "uuuu"))
    def multi(keys: Seq[org.apache.spark.sql.Column]): Set[(Long, Long, Long)] = {
      val got = SortedNeighborhood.candidatesMultiPass(
        recs.toDF("id", "k"), "id", "k", keys, window = 2, maxLev = 2)
        .as[(Long, Long, Long)].collect().toSet
      graft.Storage.releaseAll(spark)
      got
    }
    val single = multi(Seq(col("k")))
    assert(!single.exists(t => t._1 == 1L && t._2 == 2L),
      "the forward pass alone must miss the leading-char pair")
    val both = multi(Seq(col("k"), reverse(col("k"))))
    assert(both.contains((1L, 2L, 1L)))
    assert(single.subsetOf(both)) // passes only ever add
    // pairs found by both passes dedupe to one row
    assert(both.count(t => t._1 == 3L && t._2 == 4L) == 1)
  }

  test("the window bound is the semantics: near keys beyond w positions are missed") {
    // "mmm1"/"mmm2" (lev 1) sit adjacent → found at any window
    assert(run(2, 2).contains((4L, 5L, 1L)))
    // "aaa1"/"aab1" (lev 1, one substitution) are 2 positions apart:
    // found at w=3, LOST at w=2 — the documented merge/purge trade
    assert(run(3, 2).contains((1L, 3L, 1L)))
    assert(!run(2, 2).exists(t => t._1 == 1L && t._2 == 3L))
  }
}
