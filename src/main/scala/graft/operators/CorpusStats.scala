package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-distribution statistics for training-data curation: which
  * sources' token distributions drift apart, and how concentrated each
  * source's vocabulary is. Both deliberately use statistics that are
  * EXACT under distribution — cosine over integer count vectors and
  * Simpson/inverse-Simpson concentration — rather than Shannon
  * entropy/KL: every aggregate here is a commuting integer sum (no
  * float-summation order anywhere) and the finishes are single IEEE
  * ops, so results replay bit-identically in any engine. Shannon forms
  * need Σ p·log p — a transcendental whose last-ulp differs across libm
  * implementations AND an order-sensitive float sum — the same reason
  * Bm25 ranks by a rational idf surrogate (operators/Bm25.scala:22).
  *
  * Scale shape: token counts are one map-side-combined aggregation; the
  * pair matrix joins the count table to itself per token and partially
  * aggregates (source_a, source_b) map-side, so the shuffled volume is
  * bounded by distinct (pair) keys per partition, not by token pair
  * multiplicity. Cost is Σ_tok S_tok² with S_tok = sources sharing that
  * token — inherent to the exact statistic; for source cardinalities in
  * the thousands, shard sources into blocks and union the block pairs.
  * Count magnitudes: Σc² must fit a long (ANSI overflow enforces, never
  * a silent wrap) — per-source token counts up to ~3·10⁹ hold; beyond,
  * pre-scale counts.
  */
object CorpusStats {

  private def tokenCounts(df: DataFrame, sourceCol: String, textCol: String) =
    df.select(col(sourceCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))

  /** Pairwise cosine similarity between sources' token COUNT vectors
    * (source_a < source_b). Pairs sharing no token have cosine 0 and are
    * omitted — at corpus scale the absent pairs are the interesting
    * output's complement, and emitting them would densify a sparse
    * matrix.
    */
  def sourceCosineMatrix(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val tc = tokenCounts(df, sourceCol, textCol)
    val m = tc.groupBy(col("source")).agg(sum(col("c") * col("c")).as("ssq"))
    val pairs = tc.select(col("source").as("source_a"), col("tok"), col("c").as("ca"))
      .join(tc.select(col("source").as("source_b"), col("tok"), col("c").as("cb")), "tok")
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("ca") * col("cb")).as("sab"))
    pairs
      .join(broadcast(m.select(col("source").as("source_a"), col("ssq").as("sa"))),
        "source_a")
      .join(broadcast(m.select(col("source").as("source_b"), col("ssq").as("sb"))),
        "source_b")
      .select(col("source_a"), col("source_b"),
        (col("sab").cast("double") /
          (sqrt(col("sa").cast("double")) * sqrt(col("sb").cast("double"))))
          .as("cosine"))
  }

  /** Per-source vocabulary concentration: total tokens, distinct tokens,
    * Simpson index Σ(c/T)² = Σc²/T² (the repeat-draw collision
    * probability), and the inverse-Simpson effective vocabulary T²/Σc².
    */
  def simpsonDiversity(df: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val tc = tokenCounts(df, sourceCol, textCol)
    tc.groupBy(col("source")).agg(
        sum(col("c")).as("t"),
        count(lit(1)).as("distinct_tokens"),
        sum(col("c") * col("c")).as("ssq"))
      .select(col("source"), col("t").as("tokens_total"), col("distinct_tokens"),
        (col("ssq").cast("double") /
          (col("t").cast("double") * col("t").cast("double"))).as("simpson"),
        ((col("t").cast("double") * col("t").cast("double")) /
          col("ssq").cast("double")).as("effective_vocab"))
  }
}
