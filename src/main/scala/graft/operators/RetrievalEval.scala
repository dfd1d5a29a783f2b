package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the harness that grades a ranking
  * (BM25, brute cosine, any ANN serve) against a relevance judgment set,
  * per query. The ANN family measures recall-vs-exact (q239); this is
  * the complementary IR-metrics layer a curation or retrieval pipeline
  * reports: reciprocal rank, precision@k, recall@k.
  *
  * Every metric is an EXACT integer (the kappa-family discipline):
  * ranks are integers, hit counts are integers, and each ratio is a
  * single ppm floor division (`1e6·a // b`, identical in Spark's
  * IntegralDivide and DuckDB's `//`) — so the whole report hash-gates
  * with no float tolerance. The conventional float form (mean AP, nDCG's
  * log2 discounts) trades that replayability for weighting refinements;
  * rr/p@k/r@k are the standard integer-exact core.
  *
  * Scale shape: the ranking frame is queries·k rows; relevance is taken
  * as a LAZY pair frame (typically a label/source equi-join the caller
  * never materializes) — n_rel reduces it with one map-side-combined
  * count per query, and the hit join touches only the queries·k ranked
  * rows. No metric ever scans the corpus.
  */
object RetrievalEval {

  /** Per-query metrics of `ranked` (queryCol, docCol, rankCol — ranks
    * 1-based, ties already broken) against `relevant` (relQueryCol,
    * relDocCol — the judgment pairs; duplicates tolerated, reduced by
    * DISTINCT). Queries are the DISTINCT query ids of `ranked`; a query
    * with an empty judgment set reports n_rel = 0 and null recall
    * (undefined, not zero — the §1.4 policy), while rr/p@k report 0 for
    * a top-k with no relevant hit.
    *
    * @return (query_id, n_rel, n_rel_at_k, first_rel_rank, rr_ppm,
    *         p_at_k_ppm, r_at_k_ppm)
    */
  def metrics(ranked: DataFrame, queryCol: String, docCol: String,
              rankCol: String, relevant: DataFrame, relQueryCol: String,
              relDocCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val rel = relevant.select(col(relQueryCol).as("__rq"),
      col(relDocCol).as("__rd")).distinct()
    val top = ranked.select(col(queryCol).as("query_id"),
        col(docCol).as("__d"), col(rankCol).as("__r"))
      .filter(col("__r") <= k)
    val queries = top.select(col("query_id")).distinct()
    val nRel = queries.join(rel, col("query_id") === col("__rq"), "left")
      .groupBy(col("query_id"))
      .agg(count(col("__rd")).as("n_rel"))
    val hits = top.join(rel, col("query_id") === col("__rq") &&
        col("__d") === col("__rd"), "left")
      .groupBy(col("query_id"))
      .agg(sum(when(col("__rq").isNotNull, 1L).otherwise(0L)).as("n_rel_at_k"),
        min(when(col("__rq").isNotNull, col("__r"))).as("first_rel_rank"))
    nRel.join(hits, Seq("query_id"))
      .select(col("query_id"), col("n_rel"), col("n_rel_at_k"),
        col("first_rel_rank").cast("long").as("first_rel_rank"))
      .withColumn("rr_ppm", coalesce(graft.functions.IntOps.intDiv(
        lit(1000000L), col("first_rel_rank")), lit(0L)))
      .withColumn("p_at_k_ppm", graft.functions.IntOps.intDiv(
        lit(1000000L) * col("n_rel_at_k"), lit(k.toLong)))
      .withColumn("r_at_k_ppm",
        when(col("n_rel") === 0L, lit(null).cast("long"))
          .otherwise(graft.functions.IntOps.intDiv(
            lit(1000000L) * col("n_rel_at_k"), col("n_rel"))))
  }
}
