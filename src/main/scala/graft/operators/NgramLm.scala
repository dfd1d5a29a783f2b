package graft.operators

import graft.functions.IntOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language model trained in-engine, and the quantized per-document
  * fluency score built on it — the n-gram-LM leg of the quality-filter
  * family (the CCNet recipe pairs exactly this with the [[Perceptron]]
  * linear filter: an LM score plus learned weights).
  *
  * Everything is EXACT integer arithmetic so training and scoring replay
  * bit-identically on any engine: counts are commutative long sums, and
  * the add-one-smoothed conditional probability
  * P(b|a) = (c(a,b) + 1) / (c(a) + V) is QUANTIZED to
  * ⌊scale · (c(a,b)+1) / (c(a)+V)⌋ per occurrence — the truncating-
  * division discipline PageRank and resource-allocation scoring already
  * use, because a float log-likelihood neither sums order-independently
  * nor crosses engines bit-exactly (the entropy-oracle probe: JVM and
  * libm logs disagree in the last ulp on ~1/1200 rational inputs). A
  * document's score is the sum of its bigrams' quantized transition
  * probabilities — mean predictability × scale, high for templated/
  * repetitive text, low for token soup; the threshold consumer divides by
  * `n_bigrams` per row.
  *
  * Scale shape: ONE explode of per-document adjacent pairs feeds two
  * map-side-combined counts (bigram and context — the context count is
  * by construction the bigram count summed over successors); the corpus
  * vocabulary size rides a broadcast one-row frame (the q60 idiom); the
  * score join keys on the bigram — model-sized, not corpus-sized, per
  * distinct key. Overflow bound: scale · (c+1) must stay under 2⁶³
  * (ANSI mode throws rather than wraps) — at the default 10⁶ scale that
  * admits ~9·10¹² occurrences of a single bigram; lower `scale` for
  * corpora beyond it.
  */
object NgramLm {

  /** Adjacent in-document token pairs: (doc_id, a, b) — one row per
    * OCCURRENCE. Documents with fewer than two tokens contribute none.
    */
  private def bigrams(docs: DataFrame, idCol: String, toksCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(toksCol).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("g"))
      .select(col("doc_id"), col("g.a").as("a"), col("g.b").as("b"))

  /** The trained model: (a, b, c_bigram, c_context, p_q) — every observed
    * bigram with its counts and quantized smoothed conditional
    * probability. `vocab` (V in the smoothing denominator) is the corpus
    * distinct-token count, broadcast from one aggregate row.
    */
  def bigramModel(docs: DataFrame, idCol: String, toksCol: String,
                  scale: Long = 1000000L): DataFrame = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val bg = bigrams(docs, idCol, toksCol)
    val cg = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_bigram"))
    val cc = bg.groupBy(col("a")).agg(count(lit(1)).as("c_context"))
    val v = docs.select(explode(col(toksCol)).as("t"))
      .agg(count_distinct(col("t")).as("vocab"))
    cg.join(cc, "a")
      .join(broadcast(v))
      .withColumn("p_q", IntOps.intDiv(
        lit(scale) * (col("c_bigram") + 1), col("c_context") + col("vocab")))
      .select(col("a"), col("b"), col("c_bigram"), col("c_context"), col("p_q"))
  }

  /** Adjacent in-document token TRIPLES: (doc_id, a, b, c) — one row per
    * occurrence. Documents with fewer than three tokens contribute none.
    */
  private def trigrams(docs: DataFrame, idCol: String, toksCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(toksCol).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(zip_with(
        zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 2),
          slice(col("ws"), lit(2), size(col("ws")) - 2),
          (a, b) => struct(a.as("a"), b.as("b"))),
        slice(col("ws"), lit(3), size(col("ws")) - 2),
        (ab, c) => struct(ab.getField("a").as("a"), ab.getField("b").as("b"),
          c.as("c")))).as("g"))
      .select(col("doc_id"), col("g.a").as("a"), col("g.b").as("b"),
        col("g.c").as("c"))

  /** INTERPOLATED trigram fluency score (Jelinek–Mercer with integer
    * weights w3:w2:w1, d = w3+w2+w1): per trigram occurrence (a,b,c),
    *
    *   q = ⌊w3·scale·c(abc) / (d·ctx(ab))⌋ + ⌊w2·scale·c(bc) / (d·ctx(b))⌋
    *     + ⌊w1·scale·c(c) / (d·N)⌋
    *
    * where ctx(ab)/ctx(b) are trigram/bigram CONTEXT occurrence counts,
    * c(·) the n-gram occurrence counts, N the total token count — each
    * term a guarded truncating division of exact longs (a zero context
    * contributes 0: no information, never a division error), so the score
    * replays bit-identically on any engine, which a float λ-mix of
    * float ML estimates would not. Interpolation is what makes the
    * trigram usable at all: unsmoothed trigram ML zeroes out on any
    * unseen continuation; here unseen orders gracefully back off to the
    * lower ones. Output: (doc_id, n_trigrams, score_q); documents under
    * three tokens never appear.
    */
  def trigramScoreQuantized(docs: DataFrame, modelDocs: DataFrame,
                            idCol: String, toksCol: String,
                            scale: Long = 1000000L,
                            w3: Int = 6, w2: Int = 3, w1: Int = 1): DataFrame = {
    require(scale >= 1 && w3 >= 0 && w2 >= 0 && w1 >= 0 && w3 + w2 + w1 > 0,
      "scale must be >= 1 and weights non-negative with a positive sum")
    val d = (w3 + w2 + w1).toLong
    val tgM = trigrams(modelDocs, idCol, toksCol)
    val bgM = bigrams(modelDocs, idCol, toksCol)
    val c3 = tgM.groupBy(col("a"), col("b"), col("c")).agg(count(lit(1)).as("c3"))
    val x3 = tgM.groupBy(col("a"), col("b")).agg(count(lit(1)).as("x3"))
    val c2 = bgM.groupBy(col("a").as("b"), col("b").as("c"))
      .agg(count(lit(1)).as("c2"))
    val x2 = bgM.groupBy(col("a").as("b")).agg(count(lit(1)).as("x2"))
    val c1 = modelDocs.select(explode(col(toksCol)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("c1"))
    val nn = modelDocs.select(explode(col(toksCol)).as("t"))
      .agg(count(lit(1)).as("nTot"))
    def term(wt: Long, num: Column, den: Column): Column =
      when(den > 0,
        IntOps.intDiv(lit(wt * scale) * coalesce(num, lit(0L)), lit(d) * den))
        .otherwise(lit(0L))
    trigrams(docs, idCol, toksCol)
      .join(c3, Seq("a", "b", "c"), "left")
      .join(x3, Seq("a", "b"), "left")
      .join(c2, Seq("b", "c"), "left")
      .join(x2, Seq("b"), "left")
      .join(c1, Seq("c"), "left")
      .join(broadcast(nn))
      .withColumn("q",
        term(w3, col("c3"), coalesce(col("x3"), lit(0L))) +
        term(w2, col("c2"), coalesce(col("x2"), lit(0L))) +
        term(w1, col("c1"), col("nTot")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("q")).as("score_q"))
  }

  /** Per-document quantized fluency score against the model trained on
    * `modelDocs` (pass the same frame for self-scoring): (doc_id,
    * n_bigrams, score_q) where score_q = Σ ⌊scale·(c(a,b)+1)/(c(a)+V)⌋
    * over the document's bigram occurrences. A bigram whose CONTEXT the
    * model never saw scores ⌊scale·1/V⌋ (c terms zero) — the smoothing
    * floor, never a null.
    */
  def scoreQuantized(docs: DataFrame, modelDocs: DataFrame,
                     idCol: String, toksCol: String,
                     scale: Long = 1000000L): DataFrame = {
    val model = bigramModel(modelDocs, idCol, toksCol, scale)
    val v = modelDocs.select(explode(col(toksCol)).as("t"))
      .agg(count_distinct(col("t")).as("vocab"))
    bigrams(docs, idCol, toksCol)
      .join(model.select(col("a"), col("b"), col("c_bigram")), Seq("a", "b"), "left")
      .join(model.select(col("a"), col("c_context")).distinct(), Seq("a"), "left")
      .join(broadcast(v))
      .withColumn("p_q", IntOps.intDiv(
        lit(scale) * (coalesce(col("c_bigram"), lit(0L)) + 1),
        coalesce(col("c_context"), lit(0L)) + col("vocab")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_q")).as("score_q"))
  }
}
