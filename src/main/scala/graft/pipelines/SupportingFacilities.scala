package graft.pipelines

import graft.ops.HeaderPromotion
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supporting-facilities (operating theatres) panel: the org-change
  * adjustment stage, re-deriving
  * `data/supporting-facilities/supporting-facilities_clean_org_change_adj.csv`
  * from the committed clean panel + trust lookup. Spark re-expression of
  * scripts/supporting-facilities/clean_org_changes_supporting_facilities.R,
  * delegating the shared template to [[ReferenceAdjust]] (the reference
  * copy-pastes it per dataset; we parameterise). Pinned byte-for-byte by
  * GoldenSupportingFacilitiesSpec.
  */
object SupportingFacilities {

  /** @param cleanCsv raw string frame of supporting-facilities_clean.csv in
    *                 file order (year_var, quarter_var, SHA, organisation_*…)
    * @param lookup   trust_lookup_uncomplicated_changes.csv
    *                 (old_code, final_code, experiences_split, problematic)
    */
  def adjust(cleanCsv: DataFrame, lookup: DataFrame): DataFrame = {
    // harmonise (R:41-52): drop geo columns, uppercase names, rename,
    // numeric coercion with NA on junk ("Data not returned", R:69-72)
    val indexed = HeaderPromotion.withRowIndex(cleanCsv)
    val typed = indexed
      .drop("SHA", "area_team_name", "area_team_code", "region_code", "region_name")
      .withColumn("organisation_name", upper(col("organisation_name")))
      .withColumnsRenamed(Map(
        "year_var" -> "year", "quarter_var" -> "quarter",
        "organisation_code" -> "org_code", "organisation_name" -> "org_name"))
      .withColumn("year", expr("try_cast(year AS INT)"))
      .withColumn("nr_operating_theatres", expr("try_cast(nr_operating_theatres AS DOUBLE)"))
      .withColumn("nr_day_case_theatres", expr("try_cast(nr_day_case_theatres AS DOUBLE)"))

    ReferenceAdjust.adjust(typed, lookup, ReferenceAdjust.Params(
        measureCols = Seq("nr_operating_theatres", "nr_day_case_theatres"),
        nameKeepLast = true)) // slice_tail(n = 1), R:59-63
      .select(col("year"), col("quarter"), col("org_code"),
        col("nr_operating_theatres"), col("nr_day_case_theatres"),
        col("exp_problematic_org_change"), col("org_name"),
        col("unproblematic_org_change"), col("exp_unproblematic_org_change"))
  }
}
