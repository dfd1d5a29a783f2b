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

  /** Term-level vocabulary drift between two corpus snapshots — the
    * monitoring report a recurring-crawl pipeline reads before retrain
    * ("which terms' frequency SHARE moved most since the last cut"):
    * the complement of [[sourceCosineMatrix]]'s one-number drift (that
    * says HOW FAR two distributions sit; this names the terms doing
    * the moving).
    *
    * The share delta |c_a/N_a − c_b/N_b| is compared CROSS-MULTIPLIED
    * — drift_x = |c_a·N_b − c_b·N_a| — so ranking needs no division
    * and stays an exact integer (same magnitude guard as the object
    * doc: counts·total must fit a long — ~3·10⁹ tokens per side; at
    * 100 TB pre-aggregate to a capped vocabulary or lift drift_x to
    * decimal(38,0)). Per-million shares are reported alongside via
    * exact floor division. Terms absent from one side count 0 there —
    * new and vanished vocabulary rank naturally.
    *
    * Scale shape: two map-side-combined token counts, one full outer
    * equi-join on the token, two single-row totals broadcast, and a
    * TakeOrdered top-k — no single-task window, no float anywhere.
    *
    * @return topK rows of (tok, c_a, c_b, ppm_a, ppm_b, drift_x)
    *         ordered by (drift_x DESC, tok ASC) — a total order, so
    *         the cut is deterministic
    */
  def vocabularyDrift(a: DataFrame, b: DataFrame, textCol: String,
                      topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    def counts(df: DataFrame) = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val ca = counts(a)
    val cb = counts(b)
    val tot = ca.agg(sum(col("c")).as("na"))
      .crossJoin(cb.agg(sum(col("c")).as("nb")))
    ca.select(col("tok"), col("c").as("c_a"))
      .join(cb.select(col("tok"), col("c").as("c_b")), Seq("tok"),
        "full_outer")
      .na.fill(0L, Seq("c_a", "c_b"))
      .crossJoin(broadcast(tot))
      .select(col("tok"), col("c_a"), col("c_b"),
        when(col("na") > 0, graft.functions.IntOps.intDiv(
          col("c_a") * 1000000L, col("na"))).as("ppm_a"),
        when(col("nb") > 0, graft.functions.IntOps.intDiv(
          col("c_b") * 1000000L, col("nb"))).as("ppm_b"),
        abs(col("c_a") * col("nb") - col("c_b") * col("na")).as("drift_x"))
      .orderBy(col("drift_x").desc, col("tok").asc)
      .limit(topK)
  }
}
