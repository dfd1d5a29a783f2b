package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel and cohort-retention analytics — the two classic
  * event-sequence reports every product-events pipeline ships (and the
  * natural batch complements of the q18/q83 sessionizers).
  *
  * Funnel semantics (strict ordering): a user completes stage i when
  * they have an event of stage i's type STRICTLY AFTER their earliest
  * completion of stage i−1 — the "signup, then click, then purchase"
  * reading, robust to events arriving out of order in the log because
  * only event-time ordering matters. Each stage is one groupBy(user)
  * min plus an equi-join against the previous stage's (user, ts) frame
  * — user-level, so it broadcasts once stages narrow, and the event
  * table is scanned once per stage with the stage's type filter pushed
  * down.
  *
  * Cohort semantics: a user's cohort is the day of their first event;
  * retention cell (cohort_day, k) counts users active k days after
  * their cohort day. One min-aggregate + one distinct + one join, all
  * keyed by user.
  */
object Funnel {

  /** Per-stage completion counts: (stage_idx, stage, n_users). With
    * `maxGapSeconds` each stage must land within that many seconds of
    * the previous stage's earliest completion (exact microsecond
    * comparison — no calendar arithmetic to diverge on) — the
    * "conversion window" form every funnel tool offers.
    */
  def funnelCounts(ev: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, stages: Seq[String],
                   maxGapSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    require(maxGapSeconds.forall(_ > 0), "maxGapSeconds must be positive")
    var prev = ev.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
    var out = prev.agg(count(lit(1)).as("n_users"))
      .select(lit(0).as("stage_idx"), lit(stages.head).as("stage"),
        col("n_users"))
    for (i <- 1 until stages.length) {
      val inWindow = maxGapSeconds.fold(lit(true))(g =>
        unix_micros(col("__ts").cast("timestamp")) <=
          unix_micros(col("t").cast("timestamp")) + g * 1000000L)
      val next = ev.filter(col(typeCol) === stages(i))
        .select(col(userCol).as("u"), col(tsCol).as("__ts"))
        .join(prev, "u")
        .filter(col("__ts") > col("t") && inWindow)
        .groupBy(col("u")).agg(min(col("__ts")).as("t"))
      out = out.unionByName(next.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage_idx"), lit(stages(i)).as("stage"),
          col("n_users")))
      prev = next
    }
    out
  }

  /** Retention matrix: (cohort_day, k, n_users) — users whose FIRST
    * event fell on cohort_day and who were active k days later.
    */
  def cohortRetention(ev: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val first = ev.groupBy(col(userCol).as("u"))
      .agg(min(date_trunc("day", col(tsCol)).cast("date")).as("cohort_day"))
    val active = ev.select(col(userCol).as("u"),
      date_trunc("day", col(tsCol)).cast("date").as("day")).distinct()
    active.join(first, "u")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("k"), col("u"))
      .groupBy(col("cohort_day"), col("k"))
      .agg(countDistinct(col("u")).as("n_users"))
  }
}
