package graft.operators

import graft.functions.IntOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
                            w3: Int = 6, w2: Int = 3, w1: Int = 1): DataFrame =
    scoreTrigrams(docs, idCol, toksCol,
      trigramCounts(modelDocs, idCol, toksCol), scale, w3, w2, w1)

  /** The interpolated trigram model IS its six exact count frames —
    * trigram/bigram counts with their context totals, the unigram
    * counts, and the one-row corpus token total. scale/weights are
    * scoring-time parameters (the counts don't depend on them), so
    * persisting the counts persists the model.
    */
  private final case class TriCounts(c3: DataFrame, x3: DataFrame,
                                     c2: DataFrame, x2: DataFrame,
                                     c1: DataFrame, nn: DataFrame)

  private def trigramCounts(modelDocs: DataFrame, idCol: String,
                            toksCol: String): TriCounts = {
    val tgM = trigrams(modelDocs, idCol, toksCol)
    val bgM = bigrams(modelDocs, idCol, toksCol)
    TriCounts(
      c3 = tgM.groupBy(col("a"), col("b"), col("c")).agg(count(lit(1)).as("c3")),
      x3 = tgM.groupBy(col("a"), col("b")).agg(count(lit(1)).as("x3")),
      c2 = bgM.groupBy(col("a").as("b"), col("b").as("c"))
        .agg(count(lit(1)).as("c2")),
      x2 = bgM.groupBy(col("a").as("b")).agg(count(lit(1)).as("x2")),
      c1 = modelDocs.select(explode(col(toksCol)).as("c"))
        .groupBy(col("c")).agg(count(lit(1)).as("c1")),
      nn = modelDocs.select(explode(col(toksCol)).as("t"))
        .agg(count(lit(1)).as("nTot")))
  }

  private def scoreTrigrams(docs: DataFrame, idCol: String, toksCol: String,
                            m: TriCounts, scale: Long,
                            w3: Int, w2: Int, w1: Int): DataFrame = {
    require(scale >= 1 && w3 >= 0 && w2 >= 0 && w1 >= 0 && w3 + w2 + w1 > 0,
      "scale must be >= 1 and weights non-negative with a positive sum")
    val d = (w3 + w2 + w1).toLong
    def term(wt: Long, num: Column, den: Column): Column =
      when(den > 0,
        IntOps.intDiv(lit(wt * scale) * coalesce(num, lit(0L)), lit(d) * den))
        .otherwise(lit(0L))
    trigrams(docs, idCol, toksCol)
      .join(m.c3, Seq("a", "b", "c"), "left")
      .join(m.x3, Seq("a", "b"), "left")
      .join(m.c2, Seq("b", "c"), "left")
      .join(m.x2, Seq("b"), "left")
      .join(m.c1, Seq("c"), "left")
      .join(broadcast(m.nn))
      .withColumn("q",
        term(w3, col("c3"), coalesce(col("x3"), lit(0L))) +
        term(w2, col("c2"), coalesce(col("x2"), lit(0L))) +
        term(w1, col("c1"), col("nTot")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("q")).as("score_q"))
  }

  /** Persist the trained trigram model as ONE managed parquet table —
    * the [[IvfPq.saveModel]] serving discipline applied to the count
    * frames: fit once, save, and every later session scores from the
    * loaded counts without re-reading the training corpus. Unlike the
    * IVF-PQ model (1 + nlist + m·k rows, driver-collectable) the LM is
    * VOCABULARY-sized, so it stays a distributed frame end to end —
    * rows are (kind, k1, k2, k3, cnt) with kind ∈ {c3,x3,c2,x2,c1,n}
    * and the gram strings in positional key slots. Same rebuild
    * contract as the other stores (drop table + stale orphan first).
    */
  def saveTrigramModel(modelDocs: DataFrame, idCol: String, toksCol: String,
                       table: String): Unit = {
    val m = trigramCounts(modelDocs, idCol, toksCol)
    val ns = lit(null).cast("string")
    val rows = m.c3.select(lit("c3").as("kind"), col("a").as("k1"),
        col("b").as("k2"), col("c").as("k3"), col("c3").as("cnt"))
      .unionByName(m.x3.select(lit("x3").as("kind"), col("a").as("k1"),
        col("b").as("k2"), ns.as("k3"), col("x3").as("cnt")))
      .unionByName(m.c2.select(lit("c2").as("kind"), col("b").as("k1"),
        col("c").as("k2"), ns.as("k3"), col("c2").as("cnt")))
      .unionByName(m.x2.select(lit("x2").as("kind"), col("b").as("k1"),
        ns.as("k2"), ns.as("k3"), col("x2").as("cnt")))
      .unionByName(m.c1.select(lit("c1").as("kind"), col("c").as("k1"),
        ns.as("k2"), ns.as("k3"), col("c1").as("cnt")))
      .unionByName(m.nn.select(lit("n").as("kind"), ns.as("k1"),
        ns.as("k2"), ns.as("k3"), col("nTot").as("cnt")))
    val spark = modelDocs.sparkSession
    graft.sources.Sinks.dropTableAndStaleLocation(spark, table)
    rows.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Score `docs` against a [[saveTrigramModel]] table — bit-identical
    * to [[trigramScoreQuantized]] on the corpus the model was fitted on
    * (the loaded-≡-fitted serving guarantee; a lossy round trip would
    * hash-mismatch the fitted oracle).
    */
  def trigramScoreFromStore(spark: SparkSession, table: String,
                            docs: DataFrame, idCol: String, toksCol: String,
                            scale: Long = 1000000L,
                            w3: Int = 6, w2: Int = 3, w1: Int = 1): DataFrame = {
    val t = spark.table(table)
    val m = TriCounts(
      c3 = t.filter(col("kind") === "c3").select(col("k1").as("a"),
        col("k2").as("b"), col("k3").as("c"), col("cnt").as("c3")),
      x3 = t.filter(col("kind") === "x3").select(col("k1").as("a"),
        col("k2").as("b"), col("cnt").as("x3")),
      c2 = t.filter(col("kind") === "c2").select(col("k1").as("b"),
        col("k2").as("c"), col("cnt").as("c2")),
      x2 = t.filter(col("kind") === "x2").select(col("k1").as("b"),
        col("cnt").as("x2")),
      c1 = t.filter(col("kind") === "c1").select(col("k1").as("c"),
        col("cnt").as("c1")),
      nn = t.filter(col("kind") === "n").select(col("cnt").as("nTot")))
    scoreTrigrams(docs, idCol, toksCol, m, scale, w3, w2, w1)
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
