package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a corpus against a fixed query term set —
  * the ranking stage of retrieval-style corpus queries ("which documents
  * best match these terms") without building an index first.
  *
  * Scale shape: term frequencies for the (small, driver-known) query term
  * set are computed per row from the document's own token array — the
  * corpus is NEVER exploded by token, so the only exchanges are (a) one
  * single-row corpus-statistics aggregate (broadcast back) and (b) the
  * `TakeOrderedAndProject` top-k — no full-corpus shuffle at any width.
  *
  * Determinism: the score is a FIXED, fully-parenthesized arithmetic
  * expression summed over terms in sorted order, so an external engine
  * replaying the same expression gets bit-identical doubles (no group-sum
  * whose accumulation order floats). Divergence from Robertson's BM25:
  * idf uses the RATIONAL surrogate (N − df + 0.5)/(df + 0.5) rather than
  * its logarithm — monotone in the classic idf, and exactly replayable
  * where `ln` drifts by ULPs across engines.
  */
object Bm25 {

  /** Top-k documents by BM25 score over `queryTerms`. Output: doc_id,
    * score, ordered by (score desc, doc_id). Documents containing none
    * of the terms are not ranked. No rank column: a trailing rank window
    * above the limit makes Catalyst plan a full global sort instead of
    * `TakeOrderedAndProject` — the limit IS the terminal operator so the
    * top-k stays a per-partition heap + k-row merge.
    *
    * RANKING CAVEAT (see the object scaladoc's determinism note): the
    * rational idf surrogate is monotone in the classic log-idf PER TERM,
    * but the SUM over several terms is not rank-equivalent to canonical
    * BM25 — a multi-term query can order its top-k differently than
    * Robertson's formula would. Use the default where cross-engine
    * replay matters; pass `logIdf = true` for canonical BM25 ranking
    * (the Lucene form ln(1 + (N − df + 0.5)/(df + 0.5)), always
    * positive) at the cost of `ln`'s ULP drift across engines — that
    * mode is spec-pinned against a naive Scala BM25, not hash-oracled.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], topK: Int,
           k1: Double = 1.2, b: Double = 0.75,
           logIdf: Boolean = false,
           excludeDocId: Option[Long] = None): DataFrame = {
    require(queryTerms.nonEmpty, "at least one query term")
    require(topK > 0, "topK must be positive")
    val terms = queryTerms.distinct.sorted
    // Staged projection: the token array is bound ONCE and referenced by
    // every tf column — CollapseProject keeps non-cheap aliases with
    // multiple consumers in their own project, so the regex tokenization
    // runs once per row, not once per term (the q52 lesson).
    val perDoc = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__ts"))
      .select(
        col("doc_id") +:
          size(col("__ts")).cast("long").as("dl") +:
          terms.zipWithIndex.map { case (t, i) =>
            size(filter(col("__ts"), x => x === t)).cast("long").as(s"tf_$i")
          }: _*)
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_dl") +:
        terms.indices.map { i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i")
        }: _*)
    val avgdl = col("total_dl").cast("double") / col("n_docs")
    def termScore(i: Int): Column = {
      val tf = col(s"tf_$i").cast("double")
      val df = col(s"df_$i")
      val rational = ((col("n_docs") - df) + lit(0.5)) / (df + lit(0.5))
      val idf = if (logIdf) log(rational + lit(1.0)) else rational
      idf * ((tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1 - b) + (lit(b) * (col("dl") / avgdl)))))
    }
    val scored = perDoc
      .crossJoin(broadcast(stats))
      .filter(terms.indices.map(i => col(s"tf_$i")).reduce(_ + _) > 0)
      .withColumn("score",
        terms.indices.map(termScore).reduce(_ + _))
      .select(col("doc_id"), col("score"))
    // exclusion AFTER the stats (the excluded doc still counts toward
    // df/avgdl — the more-like-this contract: the anchor shapes the
    // query, not the corpus statistics) but BEFORE the top-k heap
    val out = excludeDocId.fold(scored)(id => scored.filter(col("doc_id") =!= id))
    out.orderBy(col("score").desc, col("doc_id").asc).limit(topK)
  }
}
