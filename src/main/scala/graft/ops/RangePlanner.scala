package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-depth range planning: choose B-bucket split points for a column
  * from its exact quantiles, and report the REALIZED bucket occupancy —
  * the operator behind every "how do I range-partition/sort this 100 TB
  * table into balanced files" decision (Spark's own `repartitionByRange`
  * samples; a writer that must be reproducible — bucket j means the same
  * value range on every run and every engine — plans from exact
  * quantiles instead).
  *
  * Boundaries come from [[Percentiles.exactQuantiles]] (shuffle-parallel
  * over DISTINCT values; the same `quantile_cont` interpolation DuckDB
  * runs, so the split points are bit-identical doubles). Assignment is
  * `bucket(v) = #{j : boundary_j < v}` — values equal to a boundary go
  * LEFT, so every bucket is the half-open (b_{j-1}, b_j]. The realized
  * counts expose what equi-depth can and cannot promise: a value with
  * frequency above n/B overflows its bucket no matter where the cuts
  * fall (the skew the salted-join family exists for), and the report is
  * how that shows up before a 100 TB write, not after.
  */
object RangePlanner {

  /** One row per bucket: (bucket, lo, hi, n_rows) — `lo` null for the
    * first bucket, `hi` null for the last (unbounded ends). Null values
    * of `valueCol` are excluded (they have no range position; route them
    * to a dedicated partition upstream).
    */
  def equiDepth(df: DataFrame, valueCol: Column, buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val vals = df.select(valueCol.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val qs = (1 until buckets).map(j => (s"b$j", j.toDouble / buckets))
    val bounds = Percentiles.exactQuantiles(vals, Seq.empty, "__v", qs)
    val bucket = (1 until buckets).map(j =>
      when(col("__v") > col(s"b$j"), 1L).otherwise(0L)).reduce(_ + _)
    val counts = vals.join(broadcast(bounds))
      .select(bucket.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
    val lo = (1 until buckets).foldLeft(lit(null).cast("double")) {
      (acc, j) => when(col("bucket") === j, col(s"b$j")).otherwise(acc) }
    val hi = (1 until buckets).foldLeft(lit(null).cast("double")) {
      (acc, j) => when(col("bucket") === j - 1, col(s"b$j")).otherwise(acc) }
    counts.join(broadcast(bounds))
      .select(col("bucket"), lo.as("lo"), hi.as("hi"), col("n_rows"))
  }
}
