package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Accessor for the driver-generated parquet tables (TESTDATA.md).
  * One parquet file per table under the scale-factor dir.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame    = t("region")
  def nation: DataFrame    = t("nation")
  def customer: DataFrame  = t("customer")
  def supplier: DataFrame  = t("supplier")
  def part: DataFrame      = t("part")
  def orders: DataFrame    = t("orders")
  def lineitem: DataFrame  = t("lineitem")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read nanos as long (legacy flag) and surface a TIMESTAMP_NTZ
    * column truncated to micros — the same truncation DuckDB applies, so the
    * oracle agrees. `div` keeps the conversion integral (floor for the
    * positive epochs in play).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts",
      timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
