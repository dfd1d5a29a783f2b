package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009) — the
  * standard hybrid-retrieval combiner: fuse ranked candidate lists from
  * heterogeneous retrievers (BM25 lexical, embedding-cosine semantic,
  * ...) without score calibration, using only each list's RANKS:
  *
  *   rrf(d) = Σ_lists 1 / (kRrf + rank_list(d))
  *
  * Determinism: within each list, rank is `row_number` over
  * (score DESC, id ASC) — the id tiebreak makes ranks total; the fused
  * sum is a LEFT FOLD over the lists in caller order with missing-list
  * terms contributing exactly 0.0, so the IEEE operand order is fixed
  * and a SQL oracle replays the arithmetic bit-identically.
  *
  * Scale shape: inputs are the top-k outputs of the retrieval operators
  * (bounded candidate lists, NOT corpora) — the heavy lifting (corpus
  * scans, index probes) already happened upstream in scale-shaped
  * operators ([[Bm25.topK]], [[Similarity]]). The global rank window and
  * the fold joins therefore run over k-sized frames; the terminal
  * (rrf_score DESC, id) top-k plans as TakeOrderedAndProject.
  */
object RankFusion {

  /** Fuse bounded ranked lists; each input frame carries (idCol, scoreCol).
    *
    * SCALE NOTE (the unpartitioned-window audit): the per-list
    * `Window.orderBy` below is a deliberate single-task global rank —
    * RRF is DEFINED over each retriever's bounded top-k list (q101
    * passes top-50 frames), so the windowed frame is list-sized by
    * contract, never corpus-sized. Callers fusing unbounded frames must
    * pre-truncate (rank a corpus-sized frame here and the single
    * partition IS the bottleneck).
    *
    * @return (idCol, `rrf_score`), the fused top-`topK` by
    *         (rrf_score DESC, id ASC)
    */
  def rrf(lists: Seq[DataFrame], idCol: String, scoreCol: String,
          kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(kRrf >= 1, "kRrf must be >= 1")
    require(topK >= 1, "topK must be >= 1")
    val ranked = lists.zipWithIndex.map { case (df, i) =>
      val w = Window.orderBy(col(scoreCol).desc, col(idCol))
      df.select(col(idCol), col(scoreCol))
        // an id may legitimately appear several times in a raw retriever
        // output (one row per matching chunk); RRF is defined over ranked
        // DISTINCT items, so collapse to each id's best score first —
        // without this, duplicate ids take several rank slots and the
        // full-outer fold fans out into duplicated, inflated rows
        .groupBy(col(idCol)).agg(max(col(scoreCol)).as(scoreCol))
        .withColumn("__r", row_number().over(w))
        .select(col(idCol).as(s"__id$i"),
          (lit(1.0) / (lit(kRrf.toDouble) + col("__r").cast("double")))
            .as(s"__t$i"))
    }
    var fused = ranked.head
      .select(col("__id0").as("__id"), col("__t0").as("__fused"))
    var i = 1
    while (i < ranked.length) {
      val r = ranked(i)
      fused = fused.join(r, fused("__id") === r(s"__id$i"), "full_outer")
        .select(
          coalesce(fused("__id"), r(s"__id$i")).as("__id"),
          (coalesce(fused("__fused"), lit(0.0)) +
            coalesce(r(s"__t$i"), lit(0.0))).as("__fused"))
      i += 1
    }
    fused.select(col("__id").as(idCol), col("__fused").as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol)).limit(topK)
  }
}
