package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history from a change log — the
  * dimension-versioning operator of a warehouse load: each key's value
  * timeline becomes rows with [valid_from, valid_to) intervals, where an
  * interval opens only when the tracked values actually CHANGE
  * (consecutive duplicates collapse into the open interval) and the
  * current version carries a null valid_to.
  *
  * Scale shape: one shuffle on the key, two window passes over the same
  * (key, time, tiebreak) sort — Catalyst plans a single Exchange+Sort
  * reused by both windows (pinned in ScdSpec). Change detection is
  * null-safe (`<=>`), so a null-valued version is a real version and
  * null→null is not a change.
  */
object Scd {

  /** @param df        change log: one row per observation
    * @param keyCols   dimension key columns
    * @param orderCol  event-time column (becomes valid_from)
    * @param tieCol    unique tiebreak for simultaneous observations
    * @param valueCols tracked attribute columns
    * @return keyCols ++ valueCols ++ (valid_from, valid_to), one row per
    *         version, valid_to null for the current version
    */
  def fromChangeLog(df: DataFrame, keyCols: Seq[String], orderCol: Column,
                    tieCol: Column, valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty, "keys and values required")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol, tieCol)
    val changed = valueCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    // First row per key: every lag is null, so <=> is false and `changed`
    // is true unless the value itself is null — add the explicit guard.
    val opener = lag(tieCol, 1).over(w).isNull || changed
    val openers = df.withColumn("__open", opener).filter(col("__open"))
    openers
      .withColumn("valid_from", orderCol)
      .withColumn("valid_to", lead(orderCol, 1).over(w))
      .select((keyCols ++ valueCols).map(col) :+ col("valid_from") :+ col("valid_to"): _*)
  }
}
