package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W3 — ordered fill (LOCF / NOCB), the `tidyr::fill(.direction=...)` analog
  * (reference: scripts/wait-times/build_datasets_wait_times.R:519-520,529;
  * scripts/available-and-occupied-beds/build_datasets_overnight_day_beds.R:498).
  *
  * The reference fills in frame order; Spark frames are unordered, so the
  * caller passes explicit partition keys and a total order within each
  * partition (SURVEY §7 hard part 1). Implementation is
  * `last(_, ignoreNulls)` / `first(_, ignoreNulls)` over running frames —
  * a single window shuffle per direction, fully codegen-compatible.
  */
object Fill {

  private def w(partitionBy: Seq[String], orderBy: Seq[Column]) =
    Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy: _*)

  /** Last observation carried forward (direction = "down"). */
  def down(df: DataFrame, cols: Seq[String], partitionBy: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val win = w(partitionBy, orderBy).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(win)))
  }

  /** Next observation carried backward (direction = "up"). */
  def up(df: DataFrame, cols: Seq[String], partitionBy: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val win = w(partitionBy, orderBy).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cols.foldLeft(df)((d, c) => d.withColumn(c, first(col(c), ignoreNulls = true).over(win)))
  }

  /** tidyr `.direction = "updown"`: fill up first, then down. */
  def upDown(df: DataFrame, cols: Seq[String], partitionBy: Seq[String], orderBy: Seq[Column]): DataFrame =
    down(up(df, cols, partitionBy, orderBy), cols, partitionBy, orderBy)

  /** tidyr `.direction = "downup"`: fill down first, then up. */
  def downUp(df: DataFrame, cols: Seq[String], partitionBy: Seq[String], orderBy: Seq[Column]): DataFrame =
    up(down(df, cols, partitionBy, orderBy), cols, partitionBy, orderBy)
}
