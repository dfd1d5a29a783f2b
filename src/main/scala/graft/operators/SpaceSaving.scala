package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Space-Saving heavy hitters (Metwally, Agrawal & El Abbadi 2005) — the
  * deterministic-per-key counterpart of the count-min pipeline
  * ([[CountMin]]): a FIXED set of m counters tracks candidate frequent
  * items with PER-KEY error bounds, where CMS gives one global collision
  * bound.
  *
  * Summary contract (spec-pinned in SpaceSavingSpec):
  *   - at most m (token, est_n, err_n) entries plus one `delta`;
  *   - per key: `est_n − err_n ≤ true_n ≤ est_n` — a deterministic
  *     per-key ε, readable off the summary;
  *   - coverage: any UNTRACKED token's true count is ≤ delta, so every
  *     token with true count > delta is in the summary — the prefilter
  *     guarantee the exact-verify pass builds on.
  *
  * Scale shape: the build is ONE aggregate
  * ([[graft.functions.SpaceSavingAgg]], a TypedImperativeAggregate):
  * every map task folds its occurrences into a local m-counter summary
  * and the exchange carries one ≤ m-entry buffer per task — summary-sized
  * data regardless of corpus size, the same contract as the CMS build.
  * Merges follow the mergeable-summaries discipline (Agarwal et al.
  * 2013): absent keys contribute the absent side's delta to both
  * estimate and error, then the combined summary truncates back to the
  * top m by (est, token) with the cut mass folded into delta — so the
  * per-key bounds and the coverage rule survive arbitrary merge trees
  * (partition order, micro-batches, incremental ingest).
  *
  * Unlike CMS, the summary CONTENT (est/err values) depends on input
  * order — only the bounds are deterministic. Anything order-dependent
  * therefore stays internal: the public result ([[heavyHittersExact]])
  * is the exact-verified heavy-hitter set, which is a pure function of
  * the corpus (q84 discipline: the sketch only buys the plan, the exact
  * count is the answer).
  */
object SpaceSaving {

  /** The ≤ m-entry summary as one row: (`delta`, `entries` =
    * array<struct<token, est_n, err_n>> sorted by est desc, token asc).
    */
  def summary(tokens: DataFrame, tokenCol: String, m: Int): DataFrame =
    tokens.agg(graft.functions.SpaceSavingAgg.summary(col(tokenCol), m).as("s"))
      .select(col("s.delta").as("delta"), col("s.entries").as("entries"))

  /** The summary exploded to (token, est_n, err_n, delta) rows. */
  def topK(tokens: DataFrame, tokenCol: String, m: Int): DataFrame =
    summary(tokens, tokenCol, m)
      .select(col("delta"), explode(col("entries")).as("e"))
      .select(col("e.token").as("token"), col("e.est_n").as("est_n"),
        col("e.err_n").as("err_n"), col("delta"))

  /** Every token with exact frequency ≥ ⌈phi · N⌉, found by
    * summary-prefilter + exact verify — EXACT results without a
    * full-corpus groupBy:
    *
    *  1. ONE pass builds (count, summary) — summary-sized exchange;
    *  2. candidates = tracked tokens with est_n ≥ threshold (est never
    *     under-estimates, so no tracked heavy hitter is dropped), a
    *     bounded ≤ m driver list;
    *  3. the coverage guarantee is CHECKED, not assumed: delta <
    *     threshold must hold (pick m ≳ 2/phi) or the call fails loudly —
    *     an untracked heavy hitter is impossible under that check;
    *  4. an exact groupBy over only the candidate tokens (an `isin`
    *     prefilter the scan pushes down) removes false positives.
    *
    * @return (token, exact_n) — deterministic, order-independent
    */
  def heavyHittersExact(tokens: DataFrame, tokenCol: String, phi: Double,
                        m: Int): DataFrame = {
    require(phi > 0.0 && phi <= 1.0, "phi must be in (0, 1]")
    // Bounded driver read: one row carrying n and the ≤ m-entry summary.
    val row = tokens.agg(
      count(col(tokenCol)).as("n"),
      graft.functions.SpaceSavingAgg.summary(col(tokenCol), m).as("s"))
      .select(col("n"), col("s.delta").as("delta"), col("s.entries").as("entries"))
      .head()
    val total = row.getLong(0)
    val delta = row.getLong(1)
    val thresh = math.max(1L, math.ceil(phi * total).toLong)
    require(delta < thresh,
      s"space-saving blind spot delta=$delta reaches threshold=$thresh: " +
        s"m=$m is too small for phi=$phi on this distribution (need m ≳ ${2 / phi})")
    val candidates = row.getSeq[org.apache.spark.sql.Row](2)
      .filter(_.getLong(1) >= thresh).map(_.getString(0))
    if (candidates.isEmpty) {
      tokens.sparkSession.createDataFrame(
        tokens.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("token",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("exact_n",
            org.apache.spark.sql.types.LongType, nullable = false))))
    } else {
      tokens.filter(col(tokenCol).isin(candidates: _*))
        .groupBy(col(tokenCol).as("token"))
        .agg(count(lit(1)).as("exact_n"))
        .filter(col("exact_n") >= thresh)
    }
  }
}
