package graft.pipelines

import graft.ops.{Fill, HeaderPromotion, Relational}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supporting-facilities (operating theatres) panel: the org-change
  * adjustment stage, re-deriving
  * `data/supporting-facilities/supporting-facilities_clean_org_change_adj.csv`
  * from the committed clean panel + trust lookup. Step-for-step Spark
  * re-expression of
  * scripts/supporting-facilities/clean_org_changes_supporting_facilities.R
  * (R line cites below) — pinned against the committed golden output by
  * GoldenSupportingFacilitiesSpec.
  *
  * The reference's file-order-dependent steps (name slice_tail, fill-up)
  * are made explicit with a row index (SURVEY §7 hard part 1).
  */
object SupportingFacilities {

  /** @param cleanCsv raw string frame of supporting-facilities_clean.csv in
    *                 file order (year_var, quarter_var, SHA, organisation_*…)
    * @param lookup   trust_lookup_uncomplicated_changes.csv
    *                 (old_code, final_code, experiences_split, problematic)
    */
  def adjust(cleanCsv: DataFrame, lookup: DataFrame): DataFrame = {
    // ---- harmonise (R:41-52): drop geo columns, uppercase names, rename ----
    val indexed = HeaderPromotion.withRowIndex(cleanCsv)
    val sf0 = indexed
      .drop("SHA", "area_team_name", "area_team_code", "region_code", "region_name")
      .withColumn("organisation_name", upper(col("organisation_name")))
      .withColumnsRenamed(Map(
        "year_var" -> "year", "quarter_var" -> "quarter",
        "organisation_code" -> "org_code", "organisation_name" -> "org_name"))

    // ---- name lookup: LAST distinct (code,name) pair in file order (R:59-63) ----
    val nameLookup = Relational.firstPerGroup(
        sf0.select(col("org_code"), col("org_name"), col("_row_idx"))
          .groupBy(col("org_code"), col("org_name"))
          .agg(min(col("_row_idx")).as("first_idx")),
        Seq("org_code"), Seq(col("first_idx").desc))
      .select(col("org_code"), col("org_name"))

    // ---- numeric coercion, NA on junk like "Data not returned" (R:69-72) ----
    val sf1 = sf0.drop("org_name")
      .withColumn("year", expr("try_cast(year AS INT)"))
      .withColumn("nr_operating_theatres", expr("try_cast(nr_operating_theatres AS DOUBLE)"))
      .withColumn("nr_day_case_theatres", expr("try_cast(nr_day_case_theatres AS DOUBLE)"))

    // ---- problematic-trust flag (R:75-84) ----
    val problematicCodes = lookup.filter(col("problematic") === 1)
      .select(col("old_code").as("org_code"))
      .union(lookup.filter(col("problematic") === 1).select(col("final_code").as("org_code")))
      .distinct()
    val sf2 = sf1
      .join(broadcast(problematicCodes.withColumn("__p", lit(1))), Seq("org_code"), "left")
      .withColumn("exp_problematic_org_change", when(col("__p").isNotNull, 1).otherwise(0))
      .drop("__p")

    // ---- affected = codes on EITHER side of a clean change (R:87-96):
    // successor trusts' own rows merge with the re-keyed rows ----
    val cleanLk = lookup.filter(col("problematic") === 0)
      .select(col("old_code"), col("final_code"), col("experiences_split"))
    val affectedCodes = cleanLk.select(col("old_code").as("org_code"))
      .union(cleanLk.select(col("final_code").as("org_code"))).distinct()
    val affected = sf2.join(broadcast(affectedCodes), Seq("org_code"), "left_semi")
    val unaffected = sf2.join(broadcast(affectedCodes), Seq("org_code"), "left_anti")

    val joined = affected.join(
      broadcast(cleanLk.withColumnRenamed("old_code", "org_code")), Seq("org_code"), "left")

    // ---- change indicator: the first period under the new arrangement (R:99-133) ----
    val w = Window.partitionBy(col("org_code"), col("final_code"))
    val qnum = expr("try_cast(regexp_extract(quarter, '[0-9]+', 0) AS DOUBLE)")
    val ci0 = joined.filter(col("final_code").isNotNull)
      .withColumn("change_year", max(col("year")).over(w))
      .withColumn("__qnum", qnum)
      // reference quirk preserved: the max quarter is taken over the WHOLE
      // (org_code, final_code) group, not just the change year (R:106)
      .withColumn("__maxq", max(col("__qnum")).over(w))
      .withColumn("change_quarter",
        when(col("year") === col("change_year") && col("__qnum").isNotNull, col("__maxq")))
    val ciFilled = Fill.up(ci0, Seq("change_quarter"),
      Seq("org_code", "final_code"), Seq(col("_row_idx")))
    val ci1 = ciFilled
      .select(col("final_code"), col("change_year"), col("change_quarter"), col("experiences_split"))
      .distinct()
      .withColumnRenamed("final_code", "org_code")
      // first period with the new arrangement: +1 year (annual) / +3 months
      // (quarterly) for non-splits (R:113-133). The reference applies the
      // "Q" prefix twice on the split path (R:115 then R:132): non-splits
      // have their quarter recomputed as a bare number from the shifted date
      // in between, so only they end up with a valid "Qn" — split indicators
      // become "QQn" and never match a data row. Replicated bug-for-bug:
      // the committed golden output depends on it.
      .withColumn("__q1",
        when(col("change_quarter").isNotNull,
          concat(lit("Q"), col("change_quarter").cast("int"))))
      .withColumn("year",
        when(col("__q1").isNull && col("experiences_split") === 0,
          col("change_year") + 1).otherwise(col("change_year")))
      .withColumn("__date",
        when(col("__q1").isNotNull && col("experiences_split") === 0,
          add_months(make_date(col("year"),
            (col("change_quarter").cast("int") - 1) * 3 + 1, lit(1)), 3)))
      .withColumn("__q2",
        when(col("__date").isNotNull, quarter(col("__date")).cast("string"))
          .otherwise(col("__q1")))
      .withColumn("year", when(col("__date").isNotNull, year(col("__date"))).otherwise(col("year")))
      .withColumn("quarter", when(col("__q2").isNotNull, concat(lit("Q"), col("__q2"))))
      .select(col("org_code"), col("year"), col("quarter"), col("experiences_split"))
      .distinct()

    // ---- re-key + NA-preserving aggregation (R:136-143) ----
    val sums = Relational.naPreservingSum(Seq("nr_operating_theatres", "nr_day_case_theatres"))
    val merged = joined
      .withColumn("org_code", coalesce(col("final_code"), col("org_code")))
      .groupBy(col("year"), col("quarter"), col("org_code"), col("exp_problematic_org_change"))
      .agg(sums.head, sums.tail: _*)

    val together = Relational.unionByNameFill(Seq(
      unaffected.select(merged.columns.map(col): _*), merged))

    // ---- names, change indicators, trust-level any-flag (R:146-157) ----
    together
      .join(broadcast(nameLookup), Seq("org_code"), "left")
      .join(broadcast(ci1), Seq("org_code", "year", "quarter"), "left")
      .withColumn("unproblematic_org_change",
        when(col("experiences_split").isNotNull, 1).otherwise(0))
      .drop("experiences_split")
      .withColumn("exp_unproblematic_org_change",
        max(col("unproblematic_org_change")).over(Window.partitionBy(col("org_code"))))
      .select(col("year"), col("quarter"), col("org_code"),
        col("nr_operating_theatres"), col("nr_day_case_theatres"),
        col("exp_problematic_org_change"), col("org_name"),
        col("unproblematic_org_change"), col("exp_unproblematic_org_change"))
  }
}
