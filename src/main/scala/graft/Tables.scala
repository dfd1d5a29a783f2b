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
  /** events.parquet's `ts` physical type has drifted across testdata
    * generations (TIMESTAMP(NANOS) → TIMESTAMP(MICROS) between rounds 7
    * and 8), so the reader branches on what the file actually carries
    * rather than assuming either layout — see [[Tables.normalizeEventTs]].
    * REQUIRES `spark.sql.legacy.parquet.nanosAsLong=true` when the file
    * carries NANOS (it cannot even be schema-read without it); the reader
    * ensures it via [[Tables.initEventCompat]], which never overrides a
    * session where the flag was set explicitly.
    */
  def events: DataFrame = {
    Tables.initEventCompat(spark)
    Tables.normalizeEventTs(t("events"))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  import org.apache.spark.sql.types._

  private val NanosFlag = "spark.sql.legacy.parquet.nanosAsLong"

  /** Entry-point initializer for the events readers' one session-conf
    * requirement: a TIMESTAMP(NANOS) events.parquet can only be read with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (harmless for MICROS
    * files — the flag only changes how NANOS columns surface). Idempotent,
    * and a NO-OP on any session where the flag is ALREADY SET explicitly:
    * a shared-session caller's deliberate configuration is never
    * overridden (TestdataSchemaSpec pins both behaviors). Callers reading
    * events through their own `spark.read` must apply the same flag.
    */
  def initEventCompat(spark: SparkSession): Unit =
    if (!spark.sessionState.conf.contains(NanosFlag))
      spark.conf.set(NanosFlag, "true")

  /** Normalize the events `ts` column to TIMESTAMP_NTZ(micros) regardless of
    * the parquet physical type the driver generated:
    *   - LongType: legacy nanos-as-long read of a TIMESTAMP(NANOS) file —
    *     integer-divide to micros (floor; epochs in play are positive), the
    *     same truncation DuckDB applies, so the oracle agrees.
    *   - TimestampNTZType: already the target type (Spark's NTZ inference on
    *     an isAdjustedToUTC=false MICROS column); pass through.
    *   - TimestampType: session-tz-interpreted read of the same column; every
    *     entry point pins spark.sql.session.timeZone=UTC, so the cast to NTZ
    *     is value-identity with the DuckDB oracle's naive TIMESTAMP.
    * Any other type fails loudly — a future testdata drift must break the
    * suite (TestdataSchemaSpec), never silently skew the gate.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    case TimestampNTZType => df
    case TimestampType => df.withColumn("ts", col("ts").cast("timestamp_ntz"))
    case other =>
      throw new IllegalStateException(
        s"events.ts has unsupported parquet-read type $other; " +
          "extend Tables.normalizeEventTs for the new testdata layout")
  }
}
