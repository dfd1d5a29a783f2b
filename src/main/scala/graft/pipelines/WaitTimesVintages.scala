package graft.pipelines

import graft.ops.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The three per-vintage RTT extraction/harmonisation programs
  * (scripts/wait-times/build_datasets_wait_times.R:60-383) as declarative
  * column programs over staged frames. The Excel reader itself is modeled
  * by [[graft.sources.SourceSpec]] (no POI offline); everything AFTER the
  * read — the `setnames` chains, band-name normalisation, the 52+-week
  * harmonisation, the sheet-1⋈sheet-2 join, the percent-NA rule, and the
  * pathway prefixing — is encoded here and pinned per vintage boundary by
  * WaitTimesVintagesSpec.
  *
  * Spark shape: the reference loops file-by-file because each Excel file
  * may carry a column-set variant; here each homogeneous file family is
  * one staged scan, the program runs once per family as pure plan-time
  * renames/projections (zero executed-plan cost), and families union by
  * name (U1) — at 100 TB the per-file loop disappears into Spark's
  * multi-file scan.
  */
object WaitTimesVintages {

  /** Columns never pathway-prefixed (R:53, 194-196, 312-315). */
  val KeyCols: Seq[String] = Seq("fname", "org_code", "org_name",
    "treatment_function_code", "treatment_function", "date", "pathway")

  /** The jan07-dec10 `setnames` chain (R:139-151) — ORDER MATTERS:
    * `provider → provider_name` feeds `provider_name → org_name`.
    */
  val Jan07Renames: Seq[(String, String)] = Seq(
    "x95th_percentile_waiting_time_in_weeks" -> "95th_percentile_waiting_time_in_weeks",
    "x92nd_percentile_waiting_time_in_weeks" -> "92nd_percentile_waiting_time_in_weeks",
    "code" -> "org_code",
    "provider" -> "provider_name",
    "provider_code" -> "org_code",
    "provider_name" -> "org_name",
    "total_known_clock_start" -> "total_number_of_completed_pathways_with_a_known_clock_start",
    "total_known_clock_start_within_18_weeks" -> "total_with_a_known_clock_start_within_18_weeks",
    "percent_within_18_weeks_column_bj_column_bi" -> "percent_within_18_weeks",
    "percent_within_18_weeks_column_bi_column_bh" -> "percent_within_18_weeks",
    "percent_within_18_weeks_column_bh_column_bg" -> "percent_within_18_weeks",
    "sha" -> "sha_code")

  /** `^x` range columns → `between_` (R:171-173, 290-292, 352-354): after
    * the explicit percentile renames, the only x-prefixed survivors are
    * clean-named numeric band ranges (x18_26 → between_18_26).
    */
  def betweenify(df: DataFrame): DataFrame = {
    val m = df.columns.filter(_.startsWith("x"))
      .map(c => c -> ("between_" + c.stripPrefix("x"))).toMap
    df.withColumnsRenamed(m)
  }

  /** Pathway prefix on every non-key column + numeric cast
    * (name_pathway_adjustment, R:47-57 and 192-205).
    */
  def prefixPathway(df: DataFrame, pathway: String): DataFrame = {
    val toChange = df.columns.filterNot(KeyCols.contains)
    val renamed = df.withColumnsRenamed(toChange.map(c => c -> s"${pathway}_$c").toMap)
    toChange.foldLeft(renamed)((d, c) =>
      d.withColumn(s"${pathway}_$c", col(s"${pathway}_$c").cast("double")))
  }

  /** Vintage 1, January 2007 – December 2010 (R:60-230): one sheet per
    * file, header already promoted ([[graft.ops.HeaderPromotion]] models
    * `row_to_names`), per-pathway frames built from the sheet-text pathway
    * tag. Applies the rename chain, the incomplete-pathway total renames,
    * drops sha_code, normalises band names, nulls the degenerate percent,
    * and pathway-prefixes.
    */
  def jan07Dec10(staged: DataFrame, pathway: String): DataFrame = {
    var df = Relational.renameSeq(Relational.cleanNames(staged), Jan07Renames)
    // november-2011-style incomplete variant (R:153-156)
    if (pathway == "incomplete" &&
        df.columns.contains("total_with_a_known_clock_start_within_18_weeks"))
      df = df.withColumnRenamed("total_with_a_known_clock_start_within_18_weeks",
        "total_within_18_weeks")
    // the total column's canonical name depends on the pathway (R:158-164)
    df = if (pathway == "incomplete")
      Relational.renameSeq(df, Seq("total_all" -> "total_number_of_incomplete_pathways"))
    else
      Relational.renameSeq(df, Seq("total_all" -> "total_number_of_completed_pathways_all"))
    df = betweenify(df.drop("sha_code"))
    // a 0 percent over an all-zero month is missing, not zero (R:177-190)
    val totalCol = if (pathway == "incomplete") "total_number_of_incomplete_pathways"
      else "total_number_of_completed_pathways_all"
    if (df.columns.contains("percent_within_18_weeks") && df.columns.contains(totalCol))
      df = df.withColumn("percent_within_18_weeks",
        when(col(totalCol) === 0 && col("percent_within_18_weeks") === 0, lit(null))
          .otherwise(col("percent_within_18_weeks")))
    prefixPathway(df, pathway).drop("pathway")
  }

  /** Vintage 2, January 2011 – March 2013 (R:233-313): provider SUMMARY in
    * sheet 1, provider×SPECIALTY in sheet 2; both staged separately (the
    * SourceSpec carries sheet + skip-13), cleaned, then joined on their
    * common columns — the reference's plyr natural join (J3).
    *
    * Replicated reference quirk (R:268-272): the summary's synthetic
    * treatment_function_code tests `pathway == "non-admitted"` against the
    * already-underscored value, so non_admitted falls through to IP999 —
    * kept bit-for-bit because downstream joins key on it.
    */
  def jan11Mar13(summary: DataFrame, specialties: DataFrame, pathway: String): DataFrame = {
    val sum0 = Relational.renameSeq(Relational.cleanNames(summary), Seq(
        "x95th_percentile_waiting_time_in_weeks" -> "95th_percentile_waiting_time_in_weeks",
        "provider_name" -> "org_name"))
      .drop("sha_code")
      .withColumn("treatment_function_code",
        when(lit(pathway) === "admitted", "AP999")
          .when(lit(pathway) === "non-admitted", "NP999")
          .otherwise("IP999"))
      .withColumn("treatment_function", lit("Total"))
    val sum1 = prefixPathway(sum0, pathway).drop("fname")

    val spec0 = betweenify(
      Relational.renameSeq(Relational.cleanNames(specialties), Seq(
        "provider_name" -> "org_name"))
        .drop("sha_code"))
    val spec1 = prefixPathway(spec0, pathway).drop("fname")

    val common = spec1.columns.toSeq.intersect(sum1.columns.toSeq)
    spec1.join(broadcast(sum1), common, "left")
  }

  /** Vintage 3, April 2013 onwards (R:316-383): one specialty sheet; after
    * the standard renames, months reporting beyond 104 weeks are harmonised
    * back to the common banding (R:348-363): every `between_N_M` band with
    * N >= 52 is dropped, `total_52_plus_weeks` becomes `between_52_plus`,
    * and the auxiliary `total_<n>...`/104-week totals are removed. Region /
    * SHA / area-team columns (not present in every year) are
    * pattern-dropped (P2).
    */
  def apr13Today(staged: DataFrame, pathway: String): DataFrame = {
    var df = betweenify(
      Relational.renameSeq(Relational.cleanNames(staged), Seq(
        "x95th_percentile_waiting_time_in_weeks" -> "95th_percentile_waiting_time_in_weeks",
        "x92nd_percentile_waiting_time_in_weeks" -> "92nd_percentile_waiting_time_in_weeks",
        "provider_code" -> "org_code",
        "provider_name" -> "org_name")))
    if (df.columns.contains("total_52_plus_weeks")) {
      val bandRe = "^between_(\\d+)_(\\d+)$".r
      val dropBands = df.columns.filter {
        case bandRe(lo, _) => lo.toInt >= 52
        case _ => false
      }
      df = df.drop(dropBands: _*)
        .withColumnRenamed("total_52_plus_weeks", "between_52_plus")
      val dropTotals = df.columns.filter(c => c.matches("^total_[0-9].*") || c.contains("104"))
      df = df.drop(dropTotals: _*)
    }
    val dropRegional = df.columns.filter(c =>
      c.contains("form") || c.contains("region_code") || c.contains("nhs_region") ||
        c.contains("sha") || c.contains("area_team"))
    prefixPathway(df.drop(dropRegional: _*), pathway)
  }
}
