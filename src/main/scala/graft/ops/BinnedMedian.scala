package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W4 — re-derive a median from a binned distribution: cumulative share
  * over ordered bins; the first bin where the share crosses 0.5 yields
  * median = bin lower bound + 0.5 (reference:
  * scripts/wait-times/build_datasets_wait_times.R:508-529, where RTT
  * medians are rebuilt from wait-band counts after merging trusts).
  *
  * One window shuffle on the group keys; cumulative + total + lag share the
  * same partitioning so Catalyst plans a single exchange.
  */
object BinnedMedian {

  /** @param binCounts (groupCols..., binCol numeric-ordered, countCol)
    * @return one row per group: (groupCols..., binned_median)
    */
  def derive(binCounts: DataFrame, groupCols: Seq[String], binCol: String,
             countCol: String): DataFrame = {
    val keys = groupCols.map(col)
    val wCum = Window.partitionBy(keys: _*).orderBy(col(binCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val wLag = Window.partitionBy(keys: _*).orderBy(col(binCol))
    binCounts
      .withColumn("__pct",
        sum(col(countCol)).over(wCum).cast("double") /
          sum(col(countCol)).over(wAll).cast("double"))
      .withColumn("__lag", lag(col("__pct"), 1).over(wLag))
      .withColumn("__is_median",
        col("__pct") >= 0.5 && (col("__lag").isNull || col("__lag") < 0.5))
      .groupBy(keys: _*)
      .agg(max(when(col("__is_median"), col(binCol) + lit(0.5))).as("binned_median"))
  }
}
