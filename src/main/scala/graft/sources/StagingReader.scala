package graft.sources

import graft.ops.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative per-vintage source spec: the canonical ingestion path
  * replacing the reference's copy-pasted read/rename blocks
  * (S4-S8, P5-P7 in SURVEY §2). Excel proper is out of scope offline
  * (no POI jar under /opt/spark/jars): vintages are modeled as CSV/Parquet
  * exports, with the reference's sheet/skip/na reader options captured here.
  *
  * @param paths            file or glob paths (multi-path scan, S6)
  * @param format           "csv" | "parquet"
  * @param header           CSV header row present
  * @param naSentinels      strings mapped to null after read (§1.4; CSV
  *                         readers accept only one nullValue, the reference
  *                         needs several: `na = c("-", "", "NULL")`)
  * @param fileNameFilter   regex a file's basename must match (S6 pruning —
  *                         evaluated on `input_file_name`, so at scan time
  *                         prefer encoding vintages in directory layout for
  *                         true partition pruning)
  * @param renames          tolerant canonical-schema renames (P5)
  * @param cleanNames       snake_case all columns first (P6)
  * @param fileDateRegex    capture group over the basename + java date
  *                         format, yielding a `file_date` column (S7/S8,
  *                         e.g. `("([A-Z][a-z]+\\d{4})", "MMMMyyyy")`)
  * @param prefixNonKey     prefix every non-key column (P7 pathway renames)
  */
final case class SourceSpec(
    paths: Seq[String],
    format: String = "csv",
    header: Boolean = true,
    naSentinels: Seq[String] = Seq("", "-", "NULL", "NA"),
    fileNameFilter: Option[String] = None,
    renames: Map[String, String] = Map.empty,
    cleanNames: Boolean = true,
    fileDateRegex: Option[(String, String)] = None,
    prefixNonKey: Option[(String, Seq[String])] = None)

object StagingReader {

  /** One lazy scan: all-string staging columns + `fname` + optional
    * `file_date`, sentinel nulls applied, names canonicalised.
    */
  def read(spark: SparkSession, spec: SourceSpec): DataFrame = {
    val base = spec.format match {
      case "csv" =>
        spark.read.option("header", spec.header.toString).csv(spec.paths: _*)
      case "parquet" =>
        spark.read.parquet(spec.paths: _*)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
    val withName = base.withColumn("fname",
      regexp_extract(input_file_name(), "[^/]+$", 0))
    val filtered = spec.fileNameFilter
      .map(re => withName.filter(col("fname").rlike(re)))
      .getOrElse(withName)

    val cleaned0 = if (spec.cleanNames) Relational.cleanNames(filtered) else filtered
    val renamed = Relational.renameTolerant(cleaned0, spec.renames)

    // sentinel → null on every string column (post-read, codegen'd)
    val stringCols = renamed.schema.fields
      .filter(f => f.dataType == org.apache.spark.sql.types.StringType)
      .map(_.name).filterNot(_ == "fname")
    val nulled = stringCols.foldLeft(renamed)((d, c) =>
      d.withColumn(c, Relational.nullifySentinels(col(c), spec.naSentinels)))

    val dated = spec.fileDateRegex match {
      case Some((re, fmt)) =>
        nulled.withColumn("file_date", to_date(regexp_extract(col("fname"), re, 1), fmt))
      case None => nulled
    }

    spec.prefixNonKey match {
      case Some((prefix, keep)) =>
        val keepSet = keep.toSet ++ Set("fname", "file_date")
        val renameMap = dated.columns.filterNot(keepSet).map(c => c -> s"$prefix$c").toMap
        dated.withColumnsRenamed(renameMap)
      case None => dated
    }
  }

  /** S8 — quarter extraction from a filename-ish string: `Quarter_3`,
    * `Q3`, etc → "Q3" (reference: scripts/build_datasets_main.py:62-92).
    */
  def quarterFromName(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val q = coalesce(
      nullif(regexp_extract(c, "Quarter[_\\s]?(\\d)", 1), lit("")),
      nullif(regexp_extract(c, "Q(\\d)", 1), lit("")))
    when(q.isNotNull, concat(lit("Q"), q))
  }

  /** S8, pre-2009 variant (scripts/build_datasets_main.py:69-86): before
    * 2009-10 a fiscal year ships as ONE `All_quarters` workbook with a
    * sheet per quarter, labeled by fiscal-quarter-END month — June<yy>=Q1,
    * Sep<yy>=Q2, Dec<yy>=Q3, Mar<yy+1>=Q4 (the Q4 sheet wears the NEXT
    * calendar year's suffix). The year+1 suffix is zero-padded only below
    * 10, exactly as the reference formats it. Non-All_quarters inputs fall
    * back to [[quarterFromName]].
    */
  def quarterFromSheet(fname: org.apache.spark.sql.Column,
                       sheet: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val year = regexp_extract(fname, "(19[5-9]\\d|20[0-2]\\d)", 1)
    val yy = substring(year, 3, 2)
    val next = substring(year, 3, 2).cast("int") + 1
    val yyPlus = when(next < 10, concat(lit("0"), next.cast("string")))
      .otherwise(next.cast("string"))
    when(fname.contains("All_quarters") && year =!= "",
      when(sheet === concat(lit("June"), yy), "Q1")
        .when(sheet === concat(lit("Sep"), yy), "Q2")
        .when(sheet === concat(lit("Dec"), yy), "Q3")
        .when(sheet === concat(lit("Mar"), yyPlus), "Q4"))
      .otherwise(quarterFromName(fname))
  }
}

/** K1 — sinks. Parquet partitioned-by-key is the primary format; single-file
  * CSV only as the reference-compatible export (its coalesce(1) serialises
  * the write — never use it for large outputs).
  */
object Sinks {
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def csvSingleFile(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
