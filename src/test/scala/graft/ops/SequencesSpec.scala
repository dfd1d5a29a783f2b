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
