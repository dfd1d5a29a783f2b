package graft.pipelines

import graft.ops.{HeaderPromotion, Relational}
import graft.sources.SourceSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The per-vintage critical-care beds extraction + harmonisation programs
  * (scripts/critical-care-beds/build_datasets_critical_care_beds.R:41-255)
  * as declarative tables and column programs over staged frames — the stage
  * BEFORE [[CriticalCare.adjust]]'s org-change adjustment, mirroring
  * [[WaitTimesVintages]]/[[BedsVintages]]. CriticalCareVintagesSpec drives
  * both vintages from staged strings to the monthly panel the adjustment
  * consumes.
  */
object CriticalCareVintages {

  // ---- source specs (R:41-63 / R:136-163) ----

  /** 2002-10 family: files qualify only if they HAVE a "Level of care by
    * Trust" sheet (R:47-57 skips the rest), `na = c("-", "", "NULL")`.
    */
  def spec0210(paths: Seq[String]): SourceSpec = SourceSpec(
    paths = paths,
    format = "excel",
    excelSheet = Some("^Level of care by Trust$"),
    // raw names: clean0210 recovers the publication date from the TITLE
    // column name before snake_casing, so the spec must not pre-clean
    cleanNames = false,
    naSentinels = Seq("-", "", "NULL"))

  /** 2010-20 monthly family: sheet "Critical Care Beds", skip 7 for the
    * Aug-Nov 2010-11 files, skip 14 after; England summary files excluded
    * (R:140, 145-158).
    */
  def spec1020(paths: Seq[String], early: Boolean): SourceSpec = SourceSpec(
    paths = paths,
    format = "excel",
    excelSheet = Some("^Critical Care Beds$"),
    skipRows = if (early) 7 else 14,
    cleanNames = false, // clean1020 snake_cases (and disambiguates) itself
    naSentinels = Seq("-", "NULL"),
    fileNameFilter = Some("^(?!.*England)"))

  /** The 10 standard measure names assigned BY POSITION to staged columns
    * 6-15 (R:201-205) — the sheets never agreed on header text, so the
    * reference trusts layout, not names.
    */
  val Measures1020: Seq[String] = Seq(
    "number_of_adult_critical_care_beds_open",
    "number_of_paediatric_intensive_care_beds_open",
    "number_of_neonatal_critical_care_cots_or_beds_open",
    "number_of_adult_critical_care_beds_occupied",
    "number_of_paediatric_intensive_care_beds_occupied",
    "number_of_neonatal_critical_care_cots_or_beds_occupied",
    "adult_critical_care_beds_percent_occupied",
    "paediatric_intensive_care_beds_percent_occupied",
    "neonatal_critical_care_cots_or_beds_percent_occupied",
    "number_of_non_medical_critical_care_transfers")

  private val MonthRe =
    "January|February|March|April|May|June|July|August|September|October|November|December"

  /** 2002-10 cleaning (R:66-132) for one homogeneous family. The
    * publication month/year ride in the TITLE ROW that readxl promoted to
    * column names ("Open and staffed ... beds January 2005"), so the date is
    * recovered from the staged frame's schema, the real header is then
    * promoted from inside the data (`row_to_names(find_header)` — the first
    * row carrying the org-id header text), and the six common columns are
    * projected out.
    *
    * @param headerPattern regex locating the real header row in the first
    *                      data column (the reference's find_header = first
    *                      row with no missing cells; the caller names the
    *                      header token, e.g. "^Org ID$")
    */
  def clean0210(staged: DataFrame, headerPattern: String): DataFrame = {
    val dateName = staged.columns
      .find(c => c.contains("Open and staffed") || c.contains("Available adult critical"))
      .getOrElse(throw new IllegalArgumentException(
        "clean0210: no column name carries the publication date " +
          "(expected 'Open and staffed…'/'Available adult critical…')"))
    val dateStr = s"($MonthRe) \\d{4}".r.findFirstIn(dateName)
      .getOrElse(throw new IllegalArgumentException(
        s"clean0210: no 'Month YYYY' in column name '$dateName'"))

    val matchCol = staged.columns.filterNot(_ == "fname").head
    var df = HeaderPromotion.promote(staged, matchCol, headerPattern)
      .drop("_row_idx")
    df = Relational.cleanNames(df)
    df = Relational.renameSeq(df, Seq(
      "org_id" -> "org_code",
      "name" -> "org_name",
      "year" -> "old_year",
      "open_and_staffed_adult_critical_care_beds" ->
        "number_of_adult_critical_care_beds_open"))
    df = df
      .withColumn("date", to_date(lit(dateStr), "MMMM yyyy"))
      .withColumn("month", date_format(col("date"), "MMMM"))
      .withColumn("year", year(col("date")))
    // R:104-108 — note the alternation contains bare "ha", so ANY name
    // containing "ha" is removed; replicated as written
    val re = "form|ha|st_ha|region|sha|sha_code|dhsc|ha|old_year".r
    df = df.drop(df.columns.filter(c => re.findFirstIn(c).isDefined): _*)
    df.filter(col("org_name").isNotNull)
      .withColumn("org_name", upper(col("org_name")))
      .select(col("org_code"), col("org_name"),
        col("number_of_adult_critical_care_beds_open"),
        col("date"), col("month"), col("year"))
  }

  /** 2010-20 cleaning (R:166-255) for one homogeneous family. The staged
    * frame mirrors the reference's data.table: fname, month, year (both
    * pulled from the FILENAME, R:148-156), then the sheet columns.
    *
    * Two reference behaviours replicated bit-for-bit:
    *  - year fix-up (R:221-228): January-March rows wear the fiscal END
    *    year, everything else the start year;
    *  - the percent-NA-when-no-beds loop (R:239-245) `return(x)` exits on
    *    its FIRST iteration, so ONLY adult_critical_care_beds gets the fix —
    *    paediatric/neonatal percents keep their read value even when zero
    *    beds are open.
    */
  def clean1020(staged: DataFrame): DataFrame = {
    // Clean names FIRST: the sheet's own Year/Month copies (R:177-185)
    // collide case-insensitively with the filename-derived month/year, so
    // every by-name step (including the all-null column scan) would hit
    // AMBIGUOUS_REFERENCE until cleanNames disambiguates them to *_2.
    var df = Relational.dropAllNullCols(Relational.cleanNames(staged))
      .drop("year_2", "month_2")
    df = Relational.renameSeq(df, Seq(
      "org_id" -> "org_code", "code" -> "org_code", "name" -> "org_name"))
    val re = "form|region_code|nhs_region|region|sha|sha_code|area_team|dco_team".r
    df = df.drop(df.columns.filter(c => re.findFirstIn(c).isDefined): _*)
    // positional rename of staged columns 6-15 (R:201-205)
    require(df.columns.length >= 15,
      s"clean1020: expected >=15 columns after drops, got ${df.columns.length}")
    df = df.withColumnsRenamed(
      df.columns.slice(5, 15).zip(Measures1020).toMap)
    df = df.filter(col("org_name").isNotNull)
      .withColumn("org_name", upper(col("org_name")))
      .withColumn("year",
        when(col("month").isin("January", "February", "March"),
          (regexp_extract(col("year"), "[0-9]{2}$", 0).cast("int") + 2000).cast("string"))
          .otherwise(regexp_extract(col("year"), "^[0-9]{4}", 0)))
      .withColumn("date", to_date(concat(col("month"), lit(" "), col("year")), "MMMM yyyy"))
      .withColumn("org_name",
        regexp_replace(col("org_name"), "PRIMARY CARE TRUST", "PCT"))
    df.withColumn("adult_critical_care_beds_percent_occupied",
      when(col("number_of_adult_critical_care_beds_open") === "0", lit(null))
        .otherwise(col("adult_critical_care_beds_percent_occupied")))
  }

  /** rbind(fill=TRUE) of the two cleaned eras, fname off, sorted — the
    * monthly panel [[CriticalCare.adjust]] consumes (R:249-252, 270-271).
    */
  def assemble(families0210: Seq[(DataFrame, String)],
               families1020: Seq[DataFrame]): DataFrame = {
    val early = families0210.map { case (df, pat) => clean0210(df, pat) }
    val late = families1020.map(clean1020).map(_.drop("fname"))
    Relational.unionByNameFill(early ++ late)
      .orderBy(col("org_code"), col("year"), col("month"))
  }
}
