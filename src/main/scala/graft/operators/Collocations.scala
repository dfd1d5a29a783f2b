package graft.operators

import graft.functions.IntOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation mining over adjacent token pairs — the phrase/multi-word-
  * expression extraction step of a corpus pipeline (Manning & Schütze
  * ch. 5): rank bigrams by how much more often they co-occur than their
  * parts predict.
  *
  * The association measure is quantized LIFT,
  *
  *   lift_q = ⌊scale · c(ab) · N / (c(a) · c(b))⌋
  *
  * with c(ab) the bigram occurrence count, c(·) unigram occurrence
  * counts, N the corpus token total. PMI is log(lift), and log is
  * order-preserving — ranking or thresholding by lift_q IS ranking by
  * PMI, without the transcendental that neither sums commutatively nor
  * replays bit-identically across engines (the q119/q120
  * exact-under-distribution discipline). One truncating division of
  * exact longs per surviving bigram.
  *
  * `minCount` is the classic frequency floor: rare pairs have the
  * highest raw lift (two hapaxes adjacent once score N), so collocation
  * lists are only meaningful above a support threshold — and the floor
  * is also what keeps the output model-sized rather than
  * vocabulary²-sized.
  *
  * Scale shape: one explode into adjacent pairs feeds a map-side-
  * combined bigram count; the unigram counts join in model-sized (per
  * distinct token, twice); N rides a broadcast one-row frame. Overflow
  * bound (ANSI throws, never wraps): scale·c(ab)·N < 2⁶³ — at the
  * default 10⁶ scale a bigram may occur ~9·10¹²/N times; lower `scale`
  * for corpora beyond it.
  */
object Collocations {

  /** (a, b, c_ab, lift_q) for every adjacent pair with c(ab) >= minCount. */
  def bigramLift(docs: DataFrame, idCol: String, toksCol: String,
                 minCount: Long, scale: Long = 1000000L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val bg = docs.select(col(idCol).as("doc_id"), col(toksCol).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("g"))
      .select(col("g.a").as("a"), col("g.b").as("b"))
    val cab = bg.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val uni = docs.select(explode(col(toksCol)).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val n = docs.select(explode(col(toksCol)).as("t"))
      .agg(count(lit(1)).as("nTot"))
    cab
      .join(uni.select(col("t").as("a"), col("c").as("c_a")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("c").as("c_b")), Seq("b"))
      .join(broadcast(n))
      .select(col("a"), col("b"), col("c_ab"),
        IntOps.intDiv(lit(scale) * col("c_ab") * col("nTot"),
          col("c_a") * col("c_b")).as("lift_q"))
  }
}
