package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The generic organisational-change (merger) adjustment — the reference
  * copy-pastes this pipeline four times
  * (scripts/wait-times/build_datasets_wait_times.R:433-549;
  * scripts/available-and-occupied-beds/build_datasets_overnight_day_beds.R:450-555;
  * scripts/critical-care-beds/build_datasets_critical_care_beds.R:273-371;
  * scripts/supporting-facilities/clean_org_changes_supporting_facilities.R:51-149);
  * here it is written once, parameterised by key/time/measure columns.
  *
  * Semantics preserved exactly:
  *  - trusts touched by *problematic* changes are only flagged
  *    (`exp_problematic_org_change`), never merged (R:459-471);
  *  - unproblematic changes re-key rows to `final_code` and re-aggregate
  *    measures with the NA-preserving sum (null iff all inputs null, R:503-505);
  *  - untouched trusts pass through unchanged (semi/anti split, R:474-478);
  *  - `org_name` is re-attached as the first name per code (R:449-456,543);
  *  - `unproblematic_org_change` marks merged rows, and
  *    `exp_unproblematic_org_change` marks every row of a trust that
  *    experienced such a change (group-any, R:554-555).
  *
  * Scale posture: the lookup is broadcast (≈700 rows in the reference); the
  * fact table shuffles once for the re-key aggregation and once for the name
  * window — both on the same keys, so a 100 TB panel re-keys with two
  * key-partitioned exchanges and no driver involvement.
  */
object OrgChangeAdjust {

  /** @param data     panel rows: keyCol × timeCols × measures (+ extra cols,
    *                 which are dropped — the reference re-derives them)
    * @param lookup   (old_code, final_code, problematic 0/1)
    * @param keyCol   entity key in `data` (e.g. org_code)
    * @param timeCols panel time grain (e.g. year, quarter | date)
    * @param measureCols columns to NA-preserving-sum on merge
    */
  def adjust(data: DataFrame, lookup: DataFrame, keyCol: String,
             timeCols: Seq[String], measureCols: Seq[String]): DataFrame = {
    val groupCols = keyCol +: timeCols

    // first encountered name per code, if the panel carries one
    val hasName = data.columns.contains("org_name")
    val names =
      if (hasName)
        Relational.firstPerGroup(
          data.select(col(keyCol), col("org_name")).filter(col("org_name").isNotNull),
          Seq(keyCol), Seq(col("org_name")))
      else null

    val problematicCodes = lookup.filter(col("problematic") === 1)
      .select(col("old_code")).union(
        lookup.filter(col("problematic") === 1).select(col("final_code")))
      .distinct().withColumnRenamed("old_code", keyCol)

    val cleanLookup = lookup.filter(col("problematic") === 0)
      .select(col("old_code"), col("final_code"))

    val slim = data.select(groupCols.map(col) ++ measureCols.map(col): _*)

    // membership split: codes on EITHER side of a clean change are affected —
    // the successor trust's own rows must aggregate together with the
    // re-keyed rows, or the output would carry duplicate (key, time) grains
    // (reference: all_affected_trusts = old ∪ final,
    // clean_org_changes_supporting_facilities.R:87-91)
    val affectedKeys = cleanLookup.select(col("old_code").as(keyCol))
      .union(cleanLookup.select(col("final_code").as(keyCol)))
      .distinct()
    val affected = slim.join(broadcast(affectedKeys), Seq(keyCol), "left_semi")
    val unaffected = slim.join(broadcast(affectedKeys), Seq(keyCol), "left_anti")

    val sums = Relational.naPreservingSum(measureCols)
    val merged = affected
      .join(broadcast(cleanLookup), affected(keyCol) === cleanLookup("old_code"), "left")
      .withColumn(keyCol, coalesce(col("final_code"), col(keyCol)))
      .drop("old_code", "final_code")
      .groupBy(groupCols.map(col): _*)
      .agg(sums.head, sums.tail: _*)
      .withColumn("unproblematic_org_change", lit(1))

    val adjusted = Relational.unionByNameFill(Seq(
      merged,
      unaffected.withColumn("unproblematic_org_change", lit(0))))

    val flagged = adjusted
      .join(broadcast(problematicCodes.withColumn("__p", lit(1))), Seq(keyCol), "left")
      .withColumn("exp_problematic_org_change",
        when(col("__p").isNotNull, 1).otherwise(0))
      .drop("__p")

    val withAnyFlag = Relational.groupAnyFlag(
      flagged, Seq(keyCol), col("unproblematic_org_change"), "exp_unproblematic_org_change")

    if (hasName)
      withAnyFlag.join(broadcast(names), Seq(keyCol), "left")
    else withAnyFlag
  }
}
