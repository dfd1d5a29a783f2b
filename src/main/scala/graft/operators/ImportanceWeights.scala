package graft.operators

import graft.functions.{IntOps, PortableHash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-selection importance weights in the DSIR shape (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how target-like its HASHED n-gram
  * features look — the published recipe for picking the Wikipedia-like /
  * textbook-like slice of a web crawl before training.
  *
  * DSIR's per-feature statistic is the log likelihood ratio
  * log p̂_target(f) − log p̂_raw(f) under add-one-smoothed hashed-bigram
  * counts, summed over a document's features. The transcendental sum
  * neither commutes exactly nor replays across engines, so this engine
  * keeps the RATIO itself, quantized (the q119/q120/NgramLm
  * exact-under-distribution discipline):
  *
  *   w(f)    = ⌊scale · (ct(f)+1) · (Nr+B) / ((cr(f)+1) · (Nt+B))⌋
  *   score_q = Σ_{feature occurrences of the doc} w(f)
  *
  * with ct/cr the target/raw feature-occurrence counts, Nt/Nr the
  * respective totals, B the hash-bucket count. A sum of ratios rather
  * than a sum of logs — a documented, deterministic importance variant
  * whose use is identical (threshold or top-k selection, or resampling
  * via [[Sampling]] on the score), and whose every term is one guarded
  * truncating division of exact longs, so the whole scoring pass
  * replays bit-identically in the oracle.
  *
  * Scale shape: features are hashed bigrams (B buckets — the model is
  * B-sized regardless of vocabulary); both corpora fold into map-side-
  * combined per-bucket counts; the raw corpus joins the B-sized weight
  * table on the bucket id; totals ride a broadcast one-row frame.
  * Overflow bound (ANSI throws): scale·(ct+1)·(Nr+B) < 2⁶³ — at the
  * default 10⁶ scale, ct·Nr may reach ~9·10¹²; lower `scale` beyond.
  */
object ImportanceWeights {

  /** Hashed-bigram feature ids, one row per OCCURRENCE: (doc_id, f). */
  private def features(docs: DataFrame, idCol: String, toksCol: String,
                       buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(toksCol).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => pmod(PortableHash.hash60(concat(a, lit(" "), b)),
          lit(buckets.toLong)))).as("f"))

  /** Score `rawDocs` against `targetDocs`: (doc_id, n_feats, score_q).
    * Documents with fewer than two tokens never appear (no features).
    */
  def dsirScoreQuantized(rawDocs: DataFrame, targetDocs: DataFrame,
                         idCol: String, toksCol: String,
                         buckets: Int = 4096,
                         scale: Long = 1000000L): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val ft = features(targetDocs, idCol, toksCol, buckets)
    val fr = features(rawDocs, idCol, toksCol, buckets)
    val ct = ft.groupBy(col("f")).agg(count(lit(1)).as("ct"))
    val cr = fr.groupBy(col("f")).agg(count(lit(1)).as("cr"))
    val totals = ft.agg(count(lit(1)).as("nt"))
      .join(fr.agg(count(lit(1)).as("nr")))
    // B-sized weight table: every bucket the raw corpus can hit — built
    // from the raw side's distinct buckets so unseen-in-target buckets
    // still weight (ct = 0 → the smoothing floor)
    val w = cr
      .join(ct, Seq("f"), "left")
      .join(broadcast(totals))
      .select(col("f"), IntOps.intDiv(
        lit(scale) * (coalesce(col("ct"), lit(0L)) + 1) *
          (col("nr") + buckets.toLong),
        (col("cr") + 1) * (col("nt") + buckets.toLong)).as("w"))
    fr.join(w, Seq("f"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("score_q"))
  }
}
