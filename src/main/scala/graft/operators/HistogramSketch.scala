package graft.operators

import graft.functions.IntOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-width histogram sketch quantiles — the single-pass mergeable
  * alternative to exact distributed quantiles (q40's machinery sorts or
  * multi-passes; a histogram is ONE map-side-combined aggregation whose
  * partial states merge by addition, so it composes with streaming and
  * incremental ingest for free). Error is bounded by the bin width:
  * the estimate lands in the true quantile's bin.
  *
  * Everything is integer — bins by truncating division of non-negative
  * values, ranks as exact rational ceilings (`(num·n + den − 1) div
  * den`), within-bin interpolation as one more integer division — so
  * the estimates replay bit-exactly in the DuckDB oracle (both engines
  * truncate integral division toward zero; inputs are non-negative).
  *
  * Scale shape: the ONLY full-data pass is the (group, bin) count —
  * map-side combined, the exchange carries ≤ groups × bins rows. The
  * cumulative-rank walk runs on the tiny histogram (a per-group window
  * over ≤ bins rows), never on the data.
  */
object HistogramSketch {

  /** Estimate per-group quantiles of a NON-NEGATIVE long column.
    *
    * @param quantiles rational quantiles as (numerator, denominator),
    *                  e.g. (1,2) = p50, (19,20) = p95; rank = ceil(q·n)
    * @param binWidth  histogram bin width in the value's own units
    * @return (groupCols..., `p_num`, `p_den`, `n`, `est`) — `est` =
    *         bin·w + ((rank − cumBefore)·w) div binCount, the bin lower
    *         bound plus proportional within-bin offset
    */
  def quantileSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     binWidth: Long,
                     quantiles: Seq[(Int, Int)] = Seq((1, 2), (19, 20))): DataFrame =
    walkQuantiles(histogram(df, groupCols, valueCol, binWidth),
      groupCols, binWidth, quantiles)

  /** The (group, bin, cnt) histogram — the sketch STATE: one map-side-
    * combined count whose rows merge by ADDITION, which is what makes
    * the persisted form ([[appendToStore]]) an incremental store.
    */
  def histogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
                binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    df.groupBy(groupCols.map(col) :+
        IntOps.intDiv(col(valueCol), lit(binWidth)).as("__bin"): _*)
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Append a batch's histogram to the persisted sketch store — the
    * log-structured pattern ([[IncrementalKmv]]): ingest never reads
    * the store, reads fold the log by summing per (group, bin), so the
    * served estimates are batch-slicing-invariant (integer addition
    * commutes) and the store stays groups × bins × batches tiny.
    */
  def appendToStore(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    binWidth: Long, table: String): Unit =
    histogram(df, groupCols, valueCol, binWidth)
      .write.mode("append").format("parquet").saveAsTable(table)

  /** Serve quantile estimates from a persisted histogram store —
    * bit-identical to [[quantileSketch]] over everything ever appended
    * (fold-by-addition, then the same integer rank walk).
    */
  def quantilesFromStore(spark: org.apache.spark.sql.SparkSession,
                         table: String, groupCols: Seq[String],
                         binWidth: Long,
                         quantiles: Seq[(Int, Int)]): DataFrame = {
    val folded = spark.table(table)
      .groupBy(groupCols.map(col) :+ col("__bin"): _*)
      .agg(sum(col("__cnt")).as("__cnt"))
    walkQuantiles(folded, groupCols, binWidth, quantiles)
  }

  /** [[appendToStore]] with the batch identity stamped on every row —
    * the streaming-ingest form. Histogram state is COUNT-ADDITIVE, so
    * unlike every set-union-style store a replayed append is NOT
    * harmless: it double-counts. The ledger skips replayed batches
    * before they reach here, and the (batch id, fingerprint) tag closes
    * the remaining ledger-after-append crash window — a crash between
    * append and ledger write re-appends the SAME rows under the SAME
    * tag, and the read side collapses exact duplicate rows before
    * folding. Two legitimately identical batches carry different batch
    * ids, so intentional repeats still count twice.
    */
  def appendToStoreTagged(df: DataFrame, groupCols: Seq[String],
                          valueCol: String, binWidth: Long, table: String,
                          batchId: Long, fp: Long): Unit =
    histogram(df, groupCols, valueCol, binWidth)
      .withColumn("__batch", lit(batchId))
      .withColumn("__fp", lit(fp))
      .write.mode("append").format("parquet").saveAsTable(table)

  /** Serve quantiles from a TAGGED store ([[appendToStoreTagged]]):
    * exact-duplicate rows (same group, bin, count, batch id, AND
    * fingerprint — only a crash-window re-append produces those)
    * collapse via one distinct, then the same fold-by-addition and
    * integer rank walk as [[quantilesFromStore]]. The distinct is one
    * exchange over the sketch-sized log (groups × bins × batches rows),
    * never the data.
    */
  def quantilesFromTaggedStore(spark: org.apache.spark.sql.SparkSession,
                               table: String, groupCols: Seq[String],
                               binWidth: Long,
                               quantiles: Seq[(Int, Int)]): DataFrame = {
    val folded = spark.table(table).distinct()
      .groupBy(groupCols.map(col) :+ col("__bin"): _*)
      .agg(sum(col("__cnt")).as("__cnt"))
    walkQuantiles(folded, groupCols, binWidth, quantiles)
  }

  /** The integer rank walk over a (group, bin, cnt) histogram frame —
    * runs on the tiny sketch, never the data.
    */
  private def walkQuantiles(hist: DataFrame, groupCols: Seq[String],
                            binWidth: Long,
                            quantiles: Seq[(Int, Int)]): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (num, den) =>
      require(num >= 1 && num <= den, s"quantile $num/$den out of (0,1]")
    }
    val gs = groupCols.map(col)
    val wOrd = Window.partitionBy(gs: _*).orderBy(col("__bin"))
    val wAll = Window.partitionBy(gs: _*)
    val walk = hist
      .withColumn("__cum", sum(col("__cnt")).over(wOrd))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
      .withColumn("__before", col("__cum") - col("__cnt"))
    val perQ = quantiles.map { case (num, den) =>
      val rank = IntOps.intDiv(
        lit(num.toLong) * col("__n") + (den - 1), lit(den.toLong))
      walk
        .withColumn("__rank", rank)
        .filter(col("__before") < col("__rank") &&
          col("__rank") <= col("__cum"))
        .select(gs ++ Seq(
          lit(num).as("p_num"), lit(den).as("p_den"), col("__n").as("n"),
          (col("__bin") * binWidth + IntOps.intDiv(
            (col("__rank") - col("__before")) * binWidth,
            col("__cnt"))).as("est")): _*)
    }
    perQ.reduce(_ unionByName _)
  }
}
