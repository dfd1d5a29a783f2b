package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/fiscal-calendar expressions mirroring the reference's NHS
  * conventions (SURVEY §2.9 date family):
  *  - UK fiscal year runs April→March; Q4 belongs to the *end* year
  *    (reference: scripts/available-and-occupied-beds/
  *    build_datasets_overnight_day_beds.R:377-389).
  *  - fiscal label "2019-20" split into start/end years (same file:370-374).
  *  - month-name labels (scripts/critical-care-beds/
  *    build_datasets_critical_care_beds.R:98-100).
  * All pure `when`-chains over built-ins — codegen'd, no UDFs.
  */
object DateOps {

  /** Calendar month (1-12) → NHS fiscal quarter label: Apr-Jun→Q1,
    * Jul-Sep→Q2, Oct-Dec→Q3, Jan-Mar→Q4.
    */
  def fiscalQuarter(d: Column): Column = {
    val m = month(d)
    when(m.between(4, 6), "Q1")
      .when(m.between(7, 9), "Q2")
      .when(m.between(10, 12), "Q3")
      .otherwise("Q4")
  }

  /** Fiscal start year: April onwards belongs to the year that just started. */
  def fiscalStartYear(d: Column): Column =
    when(month(d) >= 4, year(d)).otherwise(year(d) - 1).cast("long")

  /** "FY2019-20"-style label. */
  def fiscalYearLabel(d: Column): Column = {
    val fy = fiscalStartYear(d)
    concat(lit("FY"), fy.cast("string"), lit("-"),
      lpad(((fy + 1) % 100).cast("string"), 2, "0"))
  }

  /** Full English month name ("January"). */
  def monthName(d: Column): Column = date_format(d, "MMMM")

  /** Parse "April2013" / "Apr13"-style tokens extracted from filenames
    * (reference: scripts/wait-times/build_datasets_wait_times.R:239,249).
    */
  def parseMonthYearLong(c: Column): Column = to_date(c, "MMMMyyyy")
  def parseMonthYearShort(c: Column): Column = to_date(c, "MMMyy")

  /** Fiscal "2019-20" string → (start_year, end_year). */
  def fiscalLabelStartYear(c: Column): Column =
    regexp_extract(c, "^(\\d{4})", 1).cast("long")
  def fiscalLabelEndYear(c: Column): Column = {
    val start = fiscalLabelStartYear(c)
    val suffix = regexp_extract(c, "-(\\d{2})$", 1).cast("long")
    (start - (start % 100) + suffix +
      when(suffix < (start % 100), 100).otherwise(0)).cast("long")
  }
}
