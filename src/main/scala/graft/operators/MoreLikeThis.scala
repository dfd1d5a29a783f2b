package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query-by-document retrieval ("more like this" — the Lucene MLT
  * shape): the anchor document's most DISTINCTIVE terms become the
  * query, and the corpus ranks by BM25 over them with the anchor
  * excluded from the results (but not from the statistics — the anchor
  * shapes the query, never the corpus df/avgdl).
  *
  * Term selection weight is tf(t, anchor) · (N − df + 0.5)/(df + 0.5) —
  * the anchor's term frequency times [[Bm25]]'s rational idf surrogate,
  * ties to the term (total order, so selection replays exactly). The
  * driver collects exactly `numTerms` strings — the bounded-collect
  * contract ([[IvfPq.probeCells]]' shape): the query is model-sized by
  * definition.
  *
  * Determinism note: per-doc scores are the same double sums as
  * [[Bm25.topK]] — Spark sums the selected terms in SORTED order, and
  * the q191 oracle pivots its per-term components into the same
  * alphabetical positions before a fixed-order left-associated sum, so
  * the floats agree to the bit.
  */
object MoreLikeThis {

  def topK(docs: DataFrame, idCol: String, textCol: String,
           anchorId: Long, numTerms: Int, topK: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(numTerms >= 1 && topK >= 1, "numTerms and topK must be >= 1")
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("ws"))
    val tf = toks.select(col("doc_id"), explode(col("ws")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val nDocs = toks.count()
    val terms = tf.filter(col("doc_id") === anchorId)
      .join(dfq, Seq("t"))
      .select(col("t"),
        (col("tf") * ((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
          .as("w"))
      .orderBy(col("w").desc, col("t").asc)
      .limit(numTerms)
      .collect().map(_.getString(0)).toSeq
    require(terms.nonEmpty, s"anchor $anchorId has no terms")
    Bm25.topK(docs, idCol, textCol, terms, topK, k1, b,
      excludeDocId = Some(anchorId))
  }
}
