package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class SubstringDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int,
                  minCount: Long = 2L): Map[Long, (Long, Long, Long, Double)] = {
    val df = docs.toDF("doc_id", "text")
    SubstringDedup.dupSpanStats(df, "doc_id", "text", k, minCount)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  test("a shared k-gram marks exactly its k tokens in both docs") {
    // "a b c" appears in both docs at k=3; surrounding tokens are unique.
    val got = run(Seq(
      0L -> "x1 x2 a b c x3 x4",
      1L -> "y1 a b c y2 y3 y4"), k = 3)
    assert(got(0L) == ((7L, 1L, 3L, 3.0 / 7.0)))
    assert(got(1L) == ((7L, 1L, 3L, 3.0 / 7.0)))
  }

  test("overlapping duplicated grams union their intervals (gap < k)") {
    // "a b c d" shared: two 3-grams at starts 1,2 → covered = 3 + min(3,1) = 4.
    val got = run(Seq(
      0L -> "a b c d z1 z2",
      1L -> "w1 w2 a b c d"), k = 3)
    assert(got(0L) == ((6L, 2L, 4L, 4.0 / 6.0)))
    assert(got(1L) == ((6L, 2L, 4L, 4.0 / 6.0)))
  }

  test("disjoint duplicated spans in one doc sum their coverage") {
    // doc 0 shares "a b c" (pos 1) and "p q r" (pos 7) with doc 1/2;
    // gap >= k so coverage = 3 + 3.
    val got = run(Seq(
      0L -> "a b c m1 m2 m3 p q r",
      1L -> "a b c n1 n2 n3 n4 n5",
      2L -> "o1 o2 o3 o4 o5 p q r"), k = 3)
    assert(got(0L) == ((9L, 2L, 6L, 6.0 / 9.0)))
  }

  test("within-document repetition alone reaches minCount") {
    val got = run(Seq(0L -> "a b c z1 z2 a b c", 1L -> "u1 u2 u3"), k = 3)
    // "a b c" occurs twice inside doc 0 → duplicated; covered 3 + 3.
    assert(got(0L) == ((8L, 2L, 6L, 6.0 / 8.0)))
    assert(got(1L) == ((3L, 0L, 0L, 0.0)))
  }

  test("short and empty docs report zeros but stay in the output") {
    val got = run(Seq(0L -> "a b", 1L -> "", 2L -> "a b c", 3L -> "a b c"),
      k = 3)
    assert(got(0L) == ((2L, 0L, 0L, 0.0)))
    assert(got(1L) == ((0L, 0L, 0L, 0.0)))
    assert(got(2L) == ((3L, 1L, 3L, 1.0)))
    assert(got(3L) == ((3L, 1L, 3L, 1.0)))
  }

  test("raising minCount demotes grams below the threshold") {
    val docs = Seq(0L -> "a b c x1", 1L -> "a b c x2", 2L -> "a b c x3")
    assert(run(docs, k = 3, minCount = 3L)(0L)._2 == 1L) // 3 occurrences
    assert(run(docs, k = 3, minCount = 4L)(0L)._2 == 0L)
  }
}
