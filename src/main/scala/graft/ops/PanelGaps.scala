package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Panel completeness / gap detection: the reporting-coverage audit the
  * reference performs by eye — looping over years and printing which
  * quarters exist (scripts/build_datasets_main.py:311-315, 373-376) — as a
  * distributed operator over entity × time panels: for every entity, which
  * periods between its first and last observation are MISSING.
  *
  * Scale shape: ONE shuffle (the groupBy on the entity key); the expected
  * range, the set difference, and the gap statistics are all per-row array
  * arithmetic on the grouped state. Per-entity state is bounded by the
  * panel's month span (a few hundred for any real panel), never by row
  * count — the right trade against the anti-join formulation, which
  * shuffles the fact table twice. ANSI note: gap endpoints use `get`
  * (null out of range), not `element_at` (throws under ANSI on empty).
  */
object PanelGaps {

  private def grouped(df: DataFrame, keyCols: Seq[String], dateCol: String): DataFrame =
    df.select(keyCols.map(col) :+ trunc(col(dateCol), "mon").as("__mon"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("__mon")).as("__lo"), max(col("__mon")).as("__hi"),
        collect_set(col("__mon")).as("__present"))
      .withColumn("__expected",
        sequence(col("__lo"), col("__hi"), expr("interval '1' month")))
      .withColumn("__missing",
        array_sort(array_except(col("__expected"), col("__present"))))

  /** Per-entity completeness report: expected/present/missing month counts
    * and the first/last gap months (null when the panel is complete).
    */
  def report(df: DataFrame, keyCols: Seq[String], dateCol: String): DataFrame =
    grouped(df, keyCols, dateCol).select(
      keyCols.map(col) ++ Seq(
        size(col("__expected")).cast("long").as("months_expected"),
        size(col("__present")).cast("long").as("months_present"),
        size(col("__missing")).cast("long").as("months_missing"),
        get(col("__missing"), lit(0)).as("first_gap"),
        get(col("__missing"), size(col("__missing")) - 1).as("last_gap")): _*)

  /** Granular form: one row per (entity, missing month). */
  def gaps(df: DataFrame, keyCols: Seq[String], dateCol: String): DataFrame =
    grouped(df, keyCols, dateCol)
      .select(keyCols.map(col) :+ explode(col("__missing")).as("gap_month"): _*)
}
