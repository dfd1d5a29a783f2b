package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-anonymity suppression for quasi-identifiers — the privacy gate a
  * corpus with user-derived attributes passes before release: a row
  * survives only if at least `k` rows share its full quasi-identifier
  * combination, so no released row is isolable below group size k.
  * Pair with a generalization step ([[bandNumeric]] for numeric
  * attributes) to trade precision for coverage.
  *
  * Scale shape: one hash shuffle on the quasi-identifier tuple and a
  * per-group count (an unordered window — no sort, no global task), then
  * a per-row filter. No second shuffle: the count attaches in the same
  * window stage, unlike the groupBy-then-join-back formulation. A single
  * colossal group only means a large count, not driver state.
  */
object Anonymize {

  /** Generalize a numeric column to its band index (floor(c / width)) —
    * floor, not truncation, so negative values band consistently in any
    * engine.
    */
  def bandNumeric(c: Column, width: Double): Column = {
    require(width > 0, "width must be positive")
    floor(c / width).cast("long")
  }

  /** Keep only rows whose quasi-identifier group has ≥ k members; the
    * group's size is exposed as `group_size` (callers that don't want it
    * can drop it).
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[Column], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(quasiCols: _*)
    df.withColumn("group_size", count(lit(1)).over(w))
      .filter(col("group_size") >= k)
  }

  /** l-diversity suppression (Machanavajjhala et al. 2007) — the
    * refinement k-anonymity misses: a group of k rows all sharing ONE
    * sensitive value still discloses it (the homogeneity attack), so a
    * row survives only if its quasi-identifier group carries at least
    * `l` DISTINCT sensitive values. A null sensitive value counts as a
    * real value (two groups differing only in "withheld vs stated" are
    * genuinely diverse). Exposes `group_size` and `distinct_sensitive`.
    *
    * Same one-shuffle shape as [[kAnonymize]]; the distinct count rides
    * the window as a collect_set whose state is bounded by the
    * SENSITIVE attribute's per-group cardinality (the attribute being
    * protected is low-cardinality by nature — that is why it leaks),
    * never the group size.
    */
  def lDiversify(df: DataFrame, quasiCols: Seq[Column], sensitive: Column,
                 l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(l > 0, "l must be positive")
    val w = Window.partitionBy(quasiCols: _*)
    df.withColumn("group_size", count(lit(1)).over(w))
      .withColumn("distinct_sensitive",
        size(collect_set(sensitive).over(w)).cast("long") +
          max(when(sensitive.isNull, 1L).otherwise(0L)).over(w))
      .filter(col("distinct_sensitive") >= l)
  }
}
