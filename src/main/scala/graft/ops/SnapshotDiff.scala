package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the change-data-capture primitive between two
  * versions of the same keyed table: which keys were ADDED, REMOVED, or
  * CHANGED (any non-key column differs, null-safely) between a before
  * and an after frame. The complement of SCD2 ([[Scd]]): SCD2 stores
  * history given detected changes; this detects the changes.
  *
  * Scale shape: one full-outer equi-join on the key (both sides shuffle
  * once on the key — co-locate via bucketing to elide both exchanges),
  * with the non-key payload pre-packed into a single struct per side so
  * the change test is one null-safe struct comparison, not a per-column
  * join condition. Unchanged keys drop before the result materializes.
  * Exact set semantics — the oracle replays added/removed/changed with
  * no tolerance.
  */
object SnapshotDiff {

  /** @param before earlier snapshot; @param after later snapshot — same
    *               schema, keyed by `keys` (unique per frame)
    * @return one row per differing key: (keys…, `change`) with change ∈
    *         {"added", "removed", "changed"}
    */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    // Names AND types: type drift between snapshots is a core CDC
    // hazard — caught here as a clear error, not a deep analysis
    // exception (or a silent coercion) inside the struct comparison.
    require(
      before.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        after.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"before/after schemas must match exactly; got ${before.schema.simpleString} vs ${after.schema.simpleString}")
    val payload = before.columns.filterNot(keys.contains)
    def pack(df: DataFrame, tag: String): DataFrame = {
      val v =
        if (payload.isEmpty) lit(0).as(s"__v$tag")
        else struct(payload.map(col): _*).as(s"__v$tag")
      df.select(keys.map(col) :+ v :+ lit(true).as(s"__p$tag"): _*)
    }
    pack(before, "b").join(pack(after, "a"), keys, "full_outer")
      .withColumn("change",
        when(col("__pa").isNull, lit("removed"))
          .when(col("__pb").isNull, lit("added"))
          .when(!(col("__vb") <=> col("__va")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }
}
