package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable distribution stats: fixtures chosen so the moment
  * arithmetic lands on exactly-representable values (perfect-square Σc²),
  * making the equality assertions EXACT — identical count vectors cosine
  * at 1.0, partial overlap at 9/25, disjoint pairs are absent, and
  * Simpson endpoints hit 1/k and 1.
  */
class CorpusStatsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // counts {a:3, b:4} → Σc² = 25, √25 = 5 exact
  private lazy val docs = Seq(
    ("same1", "a a a b b b b"),
    ("same2", "a a a b b b b"),
    ("half", "a a a c c c c"),
    ("disj", "q r s"),
  ).toDF("source", "text")

  test("cosine matrix: identical vectors 1.0 exact, overlap 9/25, disjoint absent") {
    val m = CorpusStats.sourceCosineMatrix(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("same1", "same2")) == 1.0)
    assert(m(("half", "same1")) == 0.36 && m(("half", "same2")) == 0.36)
    assert(!m.keySet.exists { case (x, y) => x == "disj" || y == "disj" },
      "no shared token → no pair row")
    assert(m.size == 3)
  }

  test("simpson diversity: uniform hits 1/k, single-token hits 1") {
    val d2 = Seq(("uni", "u v w x"), ("conc", "m m m m")).toDF("source", "text")
    val m = CorpusStats.simpsonDiversity(d2, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(m("uni") == ((4L, 4L, 0.25, 4.0)))
    assert(m("conc") == ((4L, 1L, 1.0, 1.0)))
  }

  test("pair aggregation combines map-side before the shuffle") {
    val p = CorpusStats.sourceCosineMatrix(docs, "source", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
  }

  test("vocabulary drift: cross-multiplied deltas, absent terms count 0") {
    // snapshot a: 4 tokens total — x×2 y z ; snapshot b: 4 tokens —
    // x y×2 w. Shares move: z vanished, w appeared, x 1/2→1/4, y 1/4→1/2
    val a = Seq((1L, "x x y z")).toDF("doc_id", "text")
    val b = Seq((2L, "x y y w")).toDF("doc_id", "text")
    val got = CorpusStats.vocabularyDrift(a, b, "text", topK = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // drift_x = |c_a·4 − c_b·4|; ppm = floor(c·10⁶/4)
    assert(got("x") == ((2L, 1L, 500000L, 250000L, 4L)))
    assert(got("y") == ((1L, 2L, 250000L, 500000L, 4L)))
    assert(got("z") == ((1L, 0L, 250000L, 0L, 4L)))
    assert(got("w") == ((0L, 1L, 0L, 250000L, 4L)))
  }

  test("vocabulary drift plan: totals broadcast, no cartesian over data") {
    val a = Seq((1L, "x x y z")).toDF("doc_id", "text")
    val b = Seq((2L, "x y y w")).toDF("doc_id", "text")
    val df = CorpusStats.vocabularyDrift(a, b, "text", topK = 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the 1-row totals frame rides as a broadcast nested-loop (fine);
    // the token join itself must never be a cartesian product
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(p.contains("TakeOrdered") || p.contains("TakeOrderedAndProject"),
      "the top-k cut must be a distributed TakeOrdered, not a sort+limit: " +
        p.take(1500))
  }

  test("vocabulary drift cut is total-ordered: drift desc then token") {
    val a = Seq((1L, "p p q r")).toDF("doc_id", "text")
    val b = Seq((2L, "q q r s")).toDF("doc_id", "text")
    // drifts: p=8, q=4, s=4, r=0 — the q/s tie at 4 must break to the
    // smaller token string, so topK=2 is (p, q), never (p, s)
    val got = CorpusStats.vocabularyDrift(a, b, "text", topK = 2)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("p", "q"))
  }
}
