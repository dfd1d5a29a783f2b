package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
