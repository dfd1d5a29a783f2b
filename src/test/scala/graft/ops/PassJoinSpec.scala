package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PassJoin invariants: the blocked join equals the brute-force
  * quadratic definition on a corpus seeded with edits AT and beyond the
  * threshold (losslessness incl. the exact-d boundary), the two-table
  * form links across unequal lengths both ways, short/empty strings
  * survive the empty-segment corner, and the plan is an equi-join —
  * never a cartesian. The independent end-to-end check is the q125
  * oracle (DuckDB levenshtein brute force over document prefixes).
  */
class PassJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 40 base strings over a small alphabet, then seeded variants at
  // hand-picked edit distances: substitutions, deletions, insertions,
  // mixed scripts of sizes 1..5 (d=3 keeps 1..3, must drop 4..5).
  private lazy val corpus: Seq[(Long, String)] = {
    val bases = (0 until 40).map { i =>
      (0 until 12 + i % 5).map(j => ('a' + ((i * 7 + j * 3) % 6)).toChar).mkString
    }
    val edited = bases.zipWithIndex.flatMap { case (b, i) =>
      val subst    = b.updated(2, 'z')                              // d=1
      val del2     = b.drop(2)                                      // d=2
      val ins3     = "xyz" + b                                      // d=3
      val mixed4   = ("q" + b.updated(1, 'y')).updated(5, 'w') + "k" // d>=4 usually
      val far      = b.take(3) + "zzzzzzzzz" + b.drop(9)
      Seq(subst, del2, ins3, mixed4, far).zipWithIndex.map {
        case (s, j) => (1000L + i * 10 + j, s)
      }
    }
    bases.zipWithIndex.map { case (s, i) => (i.toLong, s) } ++ edited ++
      Seq((9000L, ""), (9001L, "ab"), (9002L, "abc"), (9003L, "b"))
  }

  private def brute(df: DataFrame, d: Int): Set[(Long, Long, Long)] = {
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      dist = lev(sa, sb)
      if dist <= d
    } yield (ia, ib, dist.toLong)).toSet
  }

  test("blocked self-join equals brute force at d = 3 (boundary included)") {
    val df = corpus.toDF("id", "s")
    val expected = brute(df, 3)
    assert(expected.nonEmpty && expected.exists(_._3 == 3L),
      "corpus must exercise the exact-d boundary")
    val got = PassJoin.linkSelf(df, "id", "s", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    assert(got == expected)
  }

  test("blocked self-join equals brute force at d = 4") {
    val df = corpus.toDF("id", "s")
    val got = PassJoin.linkSelf(df, "id", "s", maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    assert(got == brute(df, 4))
  }

  test("two-table link finds pairs with the longer string on either side") {
    val left = Seq((1L, "abcdefghij"), (2L, "zzzzzzzz")).toDF("id", "s")
    val right = Seq((10L, "abcdefghijklm"),   // right longer by 3
      (11L, "abcdefg"),                        // right shorter by 3
      (12L, "abqqefghij")).toDF("id", "s")     // equal length, d=2
    val got = PassJoin.link(left, right, "id", "s", "id", "s", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    assert(got == Set((1L, 10L, 3L), (1L, 11L, 3L), (1L, 12L, 2L)))
  }

  test("empty and near-empty strings link correctly") {
    val df = Seq((1L, ""), (2L, "ab"), (3L, "abc"), (4L, "wxyz"))
      .toDF("id", "s")
    val got = PassJoin.linkSelf(df, "id", "s", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    assert(got == brute(df, 3))
    assert(got.contains((1L, 3L, 3L))) // "" vs "abc": three insertions
  }

  test("plan is an equi-join on the segment key — no cartesian product") {
    val df = corpus.toDF("id", "s")
    val p = PassJoin.linkSelf(df, "id", "s", maxDist = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1500))
  }

  test("refuses d = 0") {
    intercept[IllegalArgumentException] {
      PassJoin.linkSelf(corpus.toDF("id", "s"), "id", "s", maxDist = 0)
    }
  }
}
