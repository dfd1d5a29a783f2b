package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "merge sort merge join merge"),        // tf(merge)=3, short
    (2L, "stream window stream filter group"),  // two terms
    (3L, "scan filter project"),                // no query terms: unranked
    (4L, "merge stream window merge stream window merge stream window"),
    (5L, "window"),                             // rare-ish term, tiny doc
  ).toDF("doc_id", "text")

  private val terms = Seq("merge", "stream", "window")

  /** Same formula, same operation order, plain Scala doubles. */
  private def naive(k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = Seq(
      1L -> "merge sort merge join merge", 2L -> "stream window stream filter group",
      3L -> "scan filter project",
      4L -> "merge stream window merge stream window merge stream window",
      5L -> "window",
    ).map { case (id, t) => id -> t.split("\\s+").toSeq }
    val sorted = terms.sorted
    val nDocs = toks.size.toLong
    val totalDl = toks.map(_._2.size.toLong).sum
    val avgdl = totalDl.toDouble / nDocs
    val dfs = sorted.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    toks.flatMap { case (id, ws) =>
      val dl = ws.size.toLong
      val score = sorted.map { t =>
        val tf = ws.count(_ == t).toDouble
        val df = dfs(t)
        (((nDocs - df) + 0.5) / (df + 0.5)) *
          ((tf * (k1 + 1)) / (tf + k1 * ((1 - b) + (b * (dl / avgdl)))))
      }.sum
      if (ws.exists(terms.contains)) Some(id -> score) else None
    }.toMap
  }

  test("scores equal the plain-Scala BM25 with identical operation order") {
    val got = Bm25.topK(docs, "doc_id", "text", terms, topK = 10)
      .select(col("doc_id"), col("score")).as[(Long, Double)].collect().toMap
    val expected = naive()
    assert(got.keySet == expected.keySet) // doc 3 unranked
    got.foreach { case (id, s) => assert(s == expected(id), s"doc $id") }
  }

  test("ranking is by score descending with doc_id tiebreak, capped at topK") {
    val rows = Bm25.topK(docs, "doc_id", "text", terms, topK = 3)
      .select(col("doc_id"), col("score"))
      .as[(Long, Double)].collect()
    assert(rows.length == 3)
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._2 >= b._2
      case _ => true
    })
    // doc 4 contains every term repeatedly — it must rank first; the
    // naive top-3 by (score desc, id) must match exactly, in order
    assert(rows.head._1 == 4L)
    val expectedTop = naive().toSeq.sortBy { case (id, s) => (-s, id) }.take(3)
    assert(rows.toSeq.map(_._1) == expectedTop.map(_._1))
  }

  test("logIdf mode scores equal canonical (Lucene-form) BM25 and can re-rank multi-term ties") {
    val got = Bm25.topK(docs, "doc_id", "text", terms, topK = 10, logIdf = true)
      .select(col("doc_id"), col("score")).as[(Long, Double)].collect().toMap
    // naive canonical: same shape, idf = ln(1 + rational)
    val toks = Seq(
      1L -> "merge sort merge join merge", 2L -> "stream window stream filter group",
      3L -> "scan filter project",
      4L -> "merge stream window merge stream window merge stream window",
      5L -> "window",
    ).map { case (id, t) => id -> t.split("\\s+").toSeq }
    val sorted = terms.sorted
    val nDocs = toks.size.toLong
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / nDocs
    val dfs = sorted.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    val expected = toks.flatMap { case (id, ws) =>
      val dl = ws.size.toLong
      val score = sorted.map { t =>
        val tf = ws.count(_ == t).toDouble
        val df = dfs(t)
        math.log(1.0 + ((nDocs - df) + 0.5) / (df + 0.5)) *
          ((tf * (1.2 + 1)) / (tf + 1.2 * ((1 - 0.75) + (0.75 * (dl / avgdl)))))
      }.sum
      if (ws.exists(terms.contains)) Some(id -> score) else None
    }.toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - expected(id)) < 1e-12, s"doc $id: $s vs ${expected(id)}")
    }
    // idf compression differs between the modes: log idf is positive and
    // flatter, rational idf rewards rare terms harder — so the two modes
    // are NOT forced to agree on ordering (the documented caveat)
    assert(expected.values.forall(_ > 0))
  }

  test("the top-k is TakeOrdered, never a corpus-wide single-task window") {
    // topK must be below the known row count: EliminateLimits drops a
    // provably-redundant limit (maxRows ≤ k) and with it the TakeOrdered
    // shape, so k=10 over 5 local rows would plan a bare global Sort.
    val plan = Bm25.topK(docs, "doc_id", "text", terms, topK = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
