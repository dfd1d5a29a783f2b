package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-sensitive time-series features over grouped events. The
  * exponentially-weighted moving average is the canonical one: a float
  * fold whose RESULT DEPENDS ON ACCUMULATION ORDER, so the distributed
  * formulation must fix that order explicitly — each key's events are
  * collected, sorted by (time, tiebreak), and folded left with
  * s' = α·x + (1−α)·s seeded from the first value. The same fold replays
  * bit-identically in any engine with an ordered list-reduce (the q76
  * oracle), which a windowed pow()-weights formulation cannot (pow drifts
  * by ULPs across engines).
  *
  * Scale note: one shuffle on the key; each group's events pass through a
  * single aggregation buffer, so per-key cardinality bounds task memory —
  * the trade for deterministic ordering, same caveat family as
  * stratifiedSample's window. Keys here are users/sessions (bounded
  * per-key history), not the corpus.
  */
object TimeSeries {

  /** Exponentially-decayed event counts — the FRESHNESS weight a
    * training-data mixer or recommendation ranker applies to engagement
    * signals (yesterday's click outweighs last year's). The classic
    * e^(−λΔt) is a transcendental that neither sums commutatively nor
    * replays across engines; here decay is by HALF-LIVES with the weight
    * table precomputed on the driver:
    *
    *   weight(Δ) = scale >> min(⌊Δ/halfLife⌋, 63)      (Δ ≥ 0)
    *
    * — a 64-entry literal array indexed per row (whole-stage codegen'd,
    * no pow/exp anywhere), so the group score Σ weight is an exact
    * commutative long sum that replays bit-identically. Same decay
    * shape, factor-of-2 granularity; intermediate factors come from a
    * smaller `halfLife`. The anchor `asOfMicros` must be supplied (or
    * derived deterministically, e.g. max(ts) — the q189 gate's choice):
    * a wall-clock default would make the result irreproducible. Events
    * after the anchor are excluded (their age is negative).
    *
    * Scale shape: one projection + one map-side-combined group sum.
    */
  /** SEASONAL baseline deviation — the hour-of-week anomaly primitive:
    * each key's hourly activity is compared against that key's typical
    * activity for the SAME hour of the week (Tuesday 9am vs all past
    * Tuesday 9ams), the standard seasonal-naive baseline for traffic
    * anomaly detection.
    *
    * Everything is integer arithmetic on epoch hours — no calendar
    * functions (engines disagree on week anchoring; `dayofweek` is
    * 1-based Sunday in Spark, 0-based Sunday in DuckDB):
    *   hour_slot = epoch_µs div 3600·10⁶  (the hourly instance)
    *   how       = hour_slot mod 168      (hour-of-week, epoch-anchored:
    *                                       slot 0 is Thursday 00 UTC)
    * The per-(key, how) baseline aggregates the OBSERVED hourly
    * instances (k_instances, bucket_total); the exact deviation score
    * clears the division: dev_num = n·k − total has the sign and
    * ordering of (n − total/k) scaled by k, as an exact long.
    *
    * Scale shape: the heavy stage is the (key, hour_slot) count — one
    * map-side-combined aggregate; the baseline is hour-of-week-sized
    * (≤ 168 per key) and broadcasts back.
    */
  /** Trailing-window distinct actors per active day (the WAU/MAU family
    * of engagement metrics): for every day that saw ANY activity, the
    * exact count of distinct actors active in the `windowDays`-day
    * window ENDING that day. `count(distinct)` is not a sliding window
    * function in any engine; the naive per-day formulation re-scans the
    * trailing range once per day (w full passes). This one is a single
    * linear plan: dedup to (actor, day), fan each active day out to the
    * `windowDays` report days it contributes to (a constant ×w row
    * explode — never data × days), keep report days that actually exist,
    * and one map-side-combined distinct count per day. Exact integers
    * throughout; days are civil dates of `tsCol` (UTC pinned).
    */
  def trailingActive(df: DataFrame, actorCol: String, tsCol: Column,
                     windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val ud = df.select(col(actorCol).as("__u"), to_date(tsCol).as("__d"))
      .distinct()
    val days = ud.select(col("__d").as("day")).distinct()
    val contrib = ud
      .select(col("__u"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("__o"), col("__d"))
      .select(col("__u"), date_add(col("__d"), col("__o")).as("day"))
    contrib.join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("__u")).as("n_active"))
  }

  def seasonalDeviation(df: DataFrame, keyCols: Seq[String],
                        tsCol: Column): DataFrame = {
    val hourly = df
      .withColumn("hour_slot", graft.functions.IntOps.intDiv(
        unix_micros(tsCol.cast("timestamp")), lit(3600000000L)))
      .groupBy((keyCols.map(col) :+ col("hour_slot")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("how", col("hour_slot") % 168)
    val baseline = hourly
      .groupBy((keyCols.map(col) :+ col("how")): _*)
      .agg(count(lit(1)).as("k_instances"), sum(col("n")).as("bucket_total"))
    hourly.join(broadcast(baseline), keyCols :+ "how")
      .select((keyCols.map(col) ++ Seq(col("hour_slot"), col("how"), col("n"),
        col("k_instances"), col("bucket_total"),
        (col("n") * col("k_instances") - col("bucket_total")).as("dev_num"))): _*)
  }

  def decayedCounts(df: DataFrame, keyCols: Seq[String], tsCol: Column,
                    asOfMicros: Column, halfLifeSeconds: Long,
                    scale: Long = 1000000L): DataFrame = {
    require(halfLifeSeconds >= 1, "halfLifeSeconds must be >= 1")
    require(scale >= 1, "scale must be >= 1")
    val weights = typedLit((0 to 63).map(k => scale >> k))
    val ageUs = asOfMicros - unix_micros(tsCol)
    val k = least(graft.functions.IntOps.intDiv(
      ageUs, lit(halfLifeSeconds * 1000000L)), lit(63L))
    df.filter(ageUs >= 0)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(element_at(weights, (k + 1).cast("int"))).as("decay_q"))
  }

  /** Final EWMA per key: groupBy `keyCol`, events ordered by
    * (`orderCol`, `tieCol`). Output: keyCol, n_events, ewma.
    */
  def ewmaLast(df: DataFrame, keyCol: String, orderCol: Column,
               tieCol: Column, valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1]: $alpha")
    val lst = sort_array(collect_list(struct(
      orderCol.as("t"), tieCol.as("k"), col(valueCol).cast("double").as("v"))))
    val vals = transform(col("__l"), x => x.getField("v"))
    val ew = aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
      element_at(vals, 1),
      (acc, x) => lit(alpha) * x + lit(1 - alpha) * acc)
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), lst.as("__l"))
      .select(col(keyCol), col("n_events"), ew.as("ewma"))
  }
  /** One-sided (upper) CUSUM change detection per key (Page 1954,
    * no-restart form): over events ordered by (`orderCol`, `tieCol`),
    * s_i = max(0, s_{i-1} + x_i − k), with an ALARM at each UPCROSSING
    * of h (s_{i-1} <= h < s_i). The recursion has the closed form
    * s_i = P_i − min(0, min_{j<=i} P_j) over the prefix sums
    * P_i = Σ(x_t − k), so the whole statistic is three window
    * functions — no sequential fold at all, which both engines
    * evaluate identically on exact integers (pass cents, not floats).
    * (A fold-based restart variant was rejected: DuckDB 1.0's
    * list_reduce mis-evaluates struct folds across multiple grouped
    * rows — single-row results are correct, multi-row are not — so the
    * fold form is not oracle-replayable there. Window functions are.)
    * Output: keyCol, n_events, n_alarms, final_s.
    */
  def cusum(df: DataFrame, keyCol: String, orderCol: Column, tieCol: Column,
            valueCol: String, k: Long, h: Long): DataFrame = {
    require(h > 0, s"alarm threshold h must be positive: $h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCol, tieCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wSeq = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCol, tieCol)
    val p = sum(col(valueCol).cast("long") - lit(k)).over(w)
    val withS = df
      .withColumn("__p", p)
      .withColumn("__s", col("__p") - least(lit(0L), min(col("__p")).over(w)))
      .withColumn("__sp", lag(col("__s"), 1, 0L).over(wSeq))
    withS.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__s") > h && col("__sp") <= h, 1L).otherwise(0L))
          .as("n_alarms"),
        max_by(col("__s"), struct(orderCol, tieCol)).as("final_s"))
  }

  /** The session-level table (gaps-and-islands): one row per (actor,
    * session), where a session breaks when the gap to the previous event
    * exceeds `gapUs` microseconds. q18's sessionization emits per-user
    * AGGREGATES; this is the session-grained form a funnel, attribution,
    * or engagement pipeline joins against — and the one-shot semantics
    * the streaming session store must reproduce row-for-row
    * ([[graft.streaming.StoreIngest.ingestSessionStore]]).
    *
    * `orderCol` must be an integral microsecond timestamp (the q18
    * `unix_micros(ts)` idiom); `tieCol` breaks equal-timestamp ties so
    * the session assignment is a total order. Session indices are
    * 1-based per actor in (orderCol, tieCol) order. Scale shape: two
    * windows and one aggregate over the SAME (actor)-hash shuffle —
    * Catalyst reuses the exchange; no self-join, no per-gap fan-out.
    */
  def sessionTable(df: DataFrame, actorCol: String, orderCol: Column,
                   tieCol: Column, gapUs: Long): DataFrame = {
    require(gapUs >= 1L, "gapUs must be >= 1")
    val w = Window.partitionBy(col(actorCol)).orderBy(orderCol, tieCol)
    val gap = orderCol - lag(orderCol, 1).over(w)
    df.withColumn("__new",
        when(gap.isNull || gap > lit(gapUs), 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(actorCol).as("user_id"), col("session_idx"))
      .agg(min(orderCol).as("start_us"), max(orderCol).as("end_us"),
        count(lit(1)).as("n_events"))
  }
}
