package graft.pipelines

import graft.ops.{HeaderPromotion, Relational}
import graft.sources.{SourceSpec, StagingReader}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The supporting-facilities raw-workbook build
  * (scripts/build_datasets_main.py:206-291) as a declarative staging
  * program — the E2 lifecycle entry point: quarterly theatre-count
  * workbooks (pre-2009 `All_quarters` files with one sheet per quarter,
  * later one file per quarter) are staged, dated from filename/sheet
  * labels, sliced at the marker row carrying the measure labels, and
  * appended into the long (year_var, quarter_var, measures) table that
  * `supporting-facilities.csv` holds and [[SupportingFacilities.adjust]]
  * consumes downstream.
  */
object SupportingFacilitiesStaging {

  /** The row whose presence marks the real header
    * (build_datasets_main.py:255: `filter_rows(df, 'Of which, number of
    * dedicated day case theatres')`).
    */
  val Marker = "(?i)of which, number of dedicated day case theatres"

  /** The reference's missing-value indicators (py:98-101), applied at
    * staging so sentinel cells null out before any typing.
    */
  val RefMissing: Seq[String] = Seq("", " ", ".", "-", "nan", "NaN", "NAN",
    "na", "Na", "NA", "/", "\\", "null", "NULL", "none", "None", "NONE")

  /** Pre-2009 family: one workbook per fiscal year, one sheet per quarter.
    * Only quarter-labeled sheets are read (the reference's loop matches
    * sheet names against the quarter map, py:33-36) — notes/summary sheets
    * are never parsed and cannot drive the schema.
    */
  def allQuartersSpec(paths: Seq[String]): SourceSpec = SourceSpec(
    paths, format = "excel", excelAllSheets = true, cleanNames = false,
    excelSheet = Some("^(June|Sep|Dec|Mar)\\d{2}$"),
    naSentinels = RefMissing, fileNameFilter = Some("All_quarters"))

  /** 2009-10+ family: one file per quarter, first sheet
    * (pandas `read_excel` default — py:49).
    */
  def quarterlySpec(paths: Seq[String]): SourceSpec = SourceSpec(
    paths, format = "excel", excelSheetIndex = 0, cleanNames = false,
    naSentinels = RefMissing, fileNameFilter = Some("^(?!.*All_quarters)"))

  /** year_var / quarter_var derivation (py:62-92): the year is the first
    * 19xx/20xx in the filename ('.' when absent); the quarter comes from
    * the sheet label for All_quarters workbooks and from the filename
    * otherwise. All_quarters sheets with NO quarter label (notes, totals)
    * are dropped — the reference's loop only reads matching sheets. An
    * All_quarters workbook whose filename carries NO year therefore
    * contributes no rows at all, which is the reference's behavior too
    * (extract_date_info raises on the empty year suffix and read_dataset
    * skips the file, py:53-58).
    */
  def withDateVars(staged: DataFrame): DataFrame = {
    val year = StagingReader.yearFromName(col("fname"))
    val perSheet = staged.columns.contains("sheet_name")
    val q =
      if (perSheet) StagingReader.quarterFromSheet(col("fname"), col("sheet_name"))
      else StagingReader.quarterFromName(col("fname"))
    val dated = staged
      .withColumn("year_var", when(year === "", lit(".")).otherwise(year))
      .withColumn("quarter_var", q)
    val kept = if (perSheet) dated.filter(col("quarter_var").isNotNull)
      else dated
    kept.withColumn("quarter_var", coalesce(col("quarter_var"), lit(".")))
  }

  /** One homogeneous staged family → its promoted measure table. The
    * first row where ANY staged cell matches [[Marker]] (the reference's
    * filter_rows contract, py:94-119) becomes the header of every
    * file/sheet independently; the first two promoted columns keep their
    * injected `year_var`/`quarter_var` names (py:259-264 preserves exactly
    * those two), the rest take `measureNames` by position.
    */
  def readFamily(spark: SparkSession, spec: SourceSpec,
                 measureNames: Seq[String]): DataFrame = {
    val staged = StagingReader.read(spark, spec)
    val dated = withDateVars(staged)
    // promotion partitions by (file, sheet): an All_quarters workbook
    // buries one header PER SHEET, each at its own row offset
    val keyed = dated.withColumn("_file_key",
      if (staged.columns.contains("sheet_name"))
        concat_ws("#", col("fname"), col("sheet_name"))
      else col("fname"))
    val dataCols = staged.columns.filterNot(Set("fname", "sheet_name"))
    // the reference matches the marker against ANY cell (py:104-108):
    // concatenate the row's cells on a separator no spreadsheet cell
    // contains and match the joined text
    val rowText = concat_ws("\u0001", dataCols.map(c => col(s"`$c`")): _*)
    val forPromo = keyed
      .withColumn("_row_text", rowText)
      .select((Seq(col("_file_key"), col("year_var"), col("quarter_var")) ++
        dataCols.map(c => col(s"`$c`")) :+ col("_row_text")): _*)
    val promoted = HeaderPromotion.promotePerFile(forPromo, "_file_key",
      "_row_text", Marker,
      targetNames = Seq("year_var", "quarter_var") ++ measureNames :+ "_row_text")
    promoted.drop("_file_key", "_row_idx", "_row_text")
  }

  /** `append_datasets` (py:165-196): union the families by name and sort
    * by the date keys.
    */
  def assemble(families: Seq[DataFrame]): DataFrame =
    Relational.unionByNameFill(families)
      .orderBy(col("year_var"), col("quarter_var"))
}
