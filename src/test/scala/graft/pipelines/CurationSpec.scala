package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation-pipeline invariants: per-stage accounting on a hand-built
  * corpus (dups keep the lowest id, quality gate is the integer
  * compare, cap drops the hash-rank tail), conservation (every doc
  * lands in exactly one bucket), and plan sanity (no cartesian, no
  * collect-side logic). Independent end-to-end check: the q150 oracle.
  */
class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 30 alphabetic tokens: letters·10 >= chars·7 holds (900 vs 833)
  private val good =
    (0 until 30).map(j => ('a' + (j % 26)).toChar.toString * 3).mkString(" ")
  private lazy val docs = Seq(
    (1L, "A", good),
    (2L, "A", good),                    // exact dup of 1 (same normalized text)
    (3L, "A", good.toUpperCase + " "),  // dup after lower+trim? upper ≠ lower text
    (4L, "A", "short text"),            // < 20 tokens → low quality
    (5L, "A", (1 to 25).map(_ => "1234567").mkString(" ")), // digits → letters ratio fails
    (6L, "B", good + " extra"),
  ).toDF("doc_id", "source", "text")

  test("per-stage accounting on a hand-built corpus") {
    val got = Curation.summary(docs, "doc_id", "text", "source",
        minTokens = 20, capPerSource = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // source A: 5 docs; doc2 dup of doc1; doc3 is NOT a dup (uppercase
    // normalizes differently only if lower() applied — lower(upper(good))
    // == good, so doc3 IS a dup after lower+trim); docs 4,5 low quality;
    // cap 1 keeps one of {1}; n_kept=1
    val a = got("A")
    assert(a._1 == 5L)               // n_docs
    assert(a._2 == 2L, s"dups: $a")  // docs 2 and 3 both normalize to good
    assert(a._3 == 2L)               // docs 4, 5 low quality
    assert(a._4 == 1L && a._5 == 0L) // cap 1: one kept, none over cap (only 1 survived)
    assert(a._6 == 30L)              // 30 tokens kept
    assert(got("B") == (1L, 0L, 0L, 1L, 0L, 31L))
  }

  test("conservation: every doc is counted exactly once across buckets") {
    val r = Curation.summary(docs, "doc_id", "text", "source",
        minTokens = 20, capPerSource = 1)
      .agg(sum(col("n_docs")), sum(col("n_dup") + col("n_lowq") +
        col("n_kept") + col("n_cap_dropped"))).head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 6L)
  }

  test("cap drops the hash-rank tail deterministically") {
    val many = (1L to 10L).map(i => (i, "S", good + s" uniq$i"))
      .toDF("doc_id", "source", "text")
    val r1 = Curation.summary(many, "doc_id", "text", "source", 20, 4).head()
    assert(r1.getLong(4) == 4L && r1.getLong(5) == 6L)
    val r2 = Curation.summary(many.repartition(16), "doc_id", "text",
      "source", 20, 4).head()
    assert(r1.toSeq == r2.toSeq)
  }

  test("plan: no cartesian product, single source join") {
    val p = Curation.summary(docs, "doc_id", "text", "source", 20, 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }
}
