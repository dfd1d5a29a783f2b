package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM segmentation (Recency / Frequency / Monetary — the classic
  * direct-marketing user scoring; Hughes 1994): per user, how recently
  * they last acted, how often, and how much they spent, each cut into
  * `buckets` quantile scores and composed into the familiar three-digit
  * segment code. The curation analog: per-SOURCE RFM over a crawl log
  * ranks which feeds are fresh, active, and substantive.
  *
  * Determinism ingredients (every one oracle-replayable):
  *   - the anchor is max(ts) over the INPUT — an explicit data fact,
  *     never wall clock (the q189 rule), so runs replay;
  *   - recency is exact integral division of epoch-microsecond longs;
  *   - monetary sums exact integer cents (`floor(100·v + 0.5)` — the
  *     2dp-money reconstruction, not a half-tie `round`);
  *   - score cuts are DISCRETE exact quantiles
  *     ([[Percentiles.exactQuantilesDisc]]): every threshold IS a data
  *     value, so the integer-metric comparisons cannot be flipped by an
  *     interpolation ulp;
  *   - recency scores on the NEGATED metric (higher = more recent =
  *     better), keeping one comparison direction for all three scores.
  *
  * Scale shape: one user-keyed aggregate over the events (the heavy
  * stage, map-side combined), one 1-row anchor broadcast, three
  * distinct-value-sized quantile passes over the USER frame, and three
  * broadcast 1-row threshold joins back — the event log is scanned
  * once and never re-shuffled.
  */
object Rfm {

  /** @return one row per user: (userCol, recency_days, frequency,
    *         monetary_cents, r_score, f_score, m_score, rfm) with
    *         scores in [1, buckets] and rfm = 100·r + 10·f + m.
    */
  def scores(ev: DataFrame, userCol: String, tsCol: String,
             valueCol: String, buckets: Int = 5): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val anchor = ev.agg(max(us).as("__anchor"))
    val base = ev.groupBy(col(userCol))
      .agg(max(us).as("__last"),
        count(lit(1)).as("frequency"),
        sum(floor(col(valueCol) * 100.0 + 0.5).cast("long"))
          .as("monetary_cents"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days", graft.functions.IntOps.intDiv(
        col("__anchor") - col("__last"), lit(86400000000L)))
      .withColumn("__negrec", -col("recency_days"))
      .drop("__anchor", "__last")

    val ps = (1 until buckets).map(i => s"t$i" -> i.toDouble / buckets)
    def thresholds(metric: String, prefix: String): DataFrame =
      Percentiles.exactQuantilesDisc(base, Nil, metric, ps)
        .select((1 until buckets).map(i =>
          col(s"t$i").as(s"${prefix}$i")): _*)
    def score(metric: Column, prefix: String): Column =
      (1 until buckets).foldLeft(lit(1)) { (acc, i) =>
        acc + when(metric.cast("double") > col(s"${prefix}$i"), 1).otherwise(0)
      }

    base
      .crossJoin(broadcast(thresholds("__negrec", "__r")))
      .crossJoin(broadcast(thresholds("frequency", "__f")))
      .crossJoin(broadcast(thresholds("monetary_cents", "__m")))
      .select(col(userCol), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        score(col("__negrec"), "__r").as("r_score"),
        score(col("frequency"), "__f").as("f_score"),
        score(col("monetary_cents"), "__m").as("m_score"))
      .withColumn("rfm",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }
}
