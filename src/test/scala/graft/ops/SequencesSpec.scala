package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence-analytics invariants: hand-checked transition counts and
  * row-conditional probabilities, last-event-per-key exclusion, path
  * truncation at maxLen with the (n desc, path) tie order, and input-
  * order invariance. Independent end-to-end checks: q148/q149 oracles.
  */
class SequencesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // u1: a b a b  → a→b ×2, b→a ×1 ; u2: a a c → a→a, a→c ; u3: c (no pair)
  private lazy val ev = Seq(
    (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
    (2L, 1L, "a"), (2L, 2L, "a"), (2L, 3L, "c"),
    (3L, 1L, "c"),
  ).toDF("u", "seq", "t")

  test("transition matrix: counts, conditional p, last event excluded") {
    val got = Sequences.transitionMatrix(ev, "u", "t", col("seq"), col("seq"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      ("a", "b") -> (2L, 0.5), ("a", "a") -> (1L, 0.25), ("a", "c") -> (1L, 0.25),
      ("b", "a") -> (1L, 1.0)))
  }

  test("skip-gram pairs: window bound, direction, gap, and counts") {
    // u1 = a b a b, window 2:
    //   gap1: a→b, b→a, a→b ; gap2: a→a, b→b
    // u2 = a a c, window 2: gap1: a→a, a→c ; gap2: a→c
    // u3 = c alone: nothing
    val got = Sequences.skipGramPairs(ev, "u", "t", col("seq"), col("seq"),
        window = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(got == Map(
      ("a", "b", 1L) -> 2L, ("b", "a", 1L) -> 1L, ("a", "a", 1L) -> 1L,
      ("a", "c", 1L) -> 1L,
      ("a", "a", 2L) -> 1L, ("b", "b", 2L) -> 1L, ("a", "c", 2L) -> 1L))
  }

  test("skip-gram at window 1 is the transition matrix's count column") {
    val sg = Sequences.skipGramPairs(ev, "u", "t", col("seq"), col("seq"),
        window = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    val tm = Sequences.transitionMatrix(ev, "u", "t", col("seq"), col("seq"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(sg == tm)
  }

  test("skip-gram plan: key-equi join with map-side combined counts") {
    val df = Sequences.skipGramPairs(ev, "u", "t", col("seq"), col("seq"),
      window = 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("partial_count"),
      "pair counts must combine map-side before the shuffle: " + p.take(1500))
  }

  test("skip-gram pairs are invariant to input order and partitioning") {
    val a = Sequences.skipGramPairs(ev.orderBy(rand(7)).repartition(16),
        "u", "t", col("seq"), col("seq"), window = 3)
      .collect().map(_.toSeq).toSet
    val b = Sequences.skipGramPairs(ev, "u", "t", col("seq"), col("seq"),
        window = 3)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("top paths: truncation at maxLen, deterministic tie order") {
    val got = Sequences.topPaths(ev, "u", "t", col("seq"), col("seq"),
        maxLen = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>a>c", 1L), ("a>b>a", 1L), ("c", 1L)))
  }

  test("results are invariant to input row order and partitioning") {
    val shuffled = ev.orderBy(rand(3)).repartition(16)
    val a = Sequences.transitionMatrix(shuffled, "u", "t", col("seq"), col("seq"))
      .collect().map(_.toSeq).toSet
    val b = Sequences.transitionMatrix(ev, "u", "t", col("seq"), col("seq"))
      .collect().map(_.toSeq).toSet
    assert(a == b)
    val pa = Sequences.topPaths(shuffled, "u", "t", col("seq"), col("seq"), 3, 10)
      .collect().map(_.toSeq).toSeq
    assert(pa == Seq(Seq("a>a>c", 1L), Seq("a>b>a", 1L), Seq("c", 1L)))
  }
}
