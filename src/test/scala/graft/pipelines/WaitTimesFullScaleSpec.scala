package graft.pipelines

import graft.SparkSpec
import graft.ops.Relational
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E3 end-to-end at full panel scale (VERDICT r9 #6): the reference's
  * richest pipeline (scripts/wait-times/build_datasets_wait_times.R:385-422
  * vintage fan-in, :433-549 org-change adjustment) exercised over a
  * SYNTHETIC full-scale vintage corpus — 600 trusts × 20 specialties ×
  * 135 months across all three vintage programs, 1,629,000 panel rows —
  * because the reference never committed its full wait-times outputs
  * (.MISSING_LARGE_BLOBS:2), so golden checks only cover recomputed
  * subsets.
  *
  * Every expected number below is closed-form arithmetic over the
  * generator, so the assertions are exact, not recomputations of the
  * pipeline under test:
  *  - per-vintage row counts and canonical column sets (the three
  *    harmonisation programs at scale);
  *  - output row count and (org_code, date, specialty) grain uniqueness
  *    after re-keying (the duplicate-grain hazard the affected-split
  *    exists to prevent);
  *  - exact sum preservation of every band and total measure under
  *    re-keying (counts are integral doubles, so IEEE sums are exact);
  *  - percent-within-18-weeks and binned-median re-derivation verified
  *    distributively on EVERY merged row against integer-arithmetic
  *    expectations (2·cum ⋚ total ⟺ cum/total ⋚ 0.5 for integral doubles
  *    < 2^52, so the check replays the crossing test without tolerance);
  *  - the merger change indicator landing exactly one month after the
  *    last old-code period;
  *  - the jan07 percent-NA rule (0 percent over an all-zero month is
  *    missing, R:177-190) at corpus scale.
  *
  * Corpus design: trusts T000..T599. In each 50-trust block, residues 1,2
  * merge into residue 0 (clean changes; their rows stop at month 120 as a
  * real merger's would), residue 3→4 is a PROBLEMATIC change (flag only,
  * never merged). Band counts derive from a per-row hash so totals,
  * medians and zero-months vary across the corpus.
  */
class WaitTimesFullScaleSpec extends AnyFunSuite with SparkSpec {

  private val nTrusts = 600
  private val nSpecs = 20 // + the V2-only IP999 "Total" summary grain
  private val nMonths = 135 // 2007-01 .. 2018-03
  private val cutoffMonth = 120 // old merger codes report only m < 120

  private val bands = Seq("incomplete_between_0_17", "incomplete_between_17_18",
    "incomplete_between_18_52", "incomplete_between_52_plus")
  private val totalCol = "incomplete_total_number_of_incomplete_pathways"
  private val pctCol = "incomplete_percent_within_18_weeks"
  private val medCol = "incomplete_average_median_waiting_time_in_weeks"

  // ---- generator -----------------------------------------------------
  // (t, s, m) grid with the V2-only s=20 summary grain and the old-merger
  // truncation applied; band counts from a per-row linear hash.
  private def grid: DataFrame = {
    val base = spark.range(nTrusts.toLong * (nSpecs + 1) * nMonths).select(
      (col("id") / ((nSpecs + 1) * nMonths)).cast("int").as("t"),
      ((col("id") / nMonths) % (nSpecs + 1)).cast("int").as("s"),
      (col("id") % nMonths).cast("int").as("m"))
    base
      .filter(col("s") < nSpecs || (col("m") >= 48 && col("m") < 75))
      .filter(!(col("t") % 50).isin(1, 2) || col("m") < cutoffMonth)
      .withColumn("h",
        col("t") * 1000003L + col("s") * 7919L + col("m") * 104729L)
  }

  private def withMeasures(df: DataFrame): DataFrame = df
    .withColumn("b0", (col("h") % 13).cast("double"))
    .withColumn("b1", (col("h") % 7).cast("double"))
    .withColumn("b2", (col("h") % 11).cast("double"))
    .withColumn("b3", (col("h") % 5).cast("double"))
    .withColumn("tot", col("b0") + col("b1") + col("b2") + col("b3"))
    .withColumn("org_code", format_string("T%03d", col("t")))
    .withColumn("trust_name", format_string("TRUST %d", col("t")))
    .withColumn("date", add_months(to_date(lit("2007-01-01")), col("m")))
    .withColumn("tfc",
      when(col("s") === nSpecs, "IP999").otherwise(format_string("C_%03d", col("s") + 100)))
    .withColumn("tf",
      when(col("s") === nSpecs, "Total").otherwise(format_string("Spec %d", col("s"))))
    .withColumn("fname", format_string("rtt_%d.xls", col("m")))

  /** jan07-dec10 staged shape: the rename-chain inputs (code, provider,
    * total_all, the long percent name), x-prefixed bands, sha.
    */
  private def v1Staged: DataFrame =
    withMeasures(grid.filter(col("m") < 48 && col("s") < nSpecs)).select(
      col("fname"), col("org_code").as("code"), col("trust_name").as("provider"),
      col("date"), col("tfc").as("treatment_function_code"),
      col("tf").as("treatment_function"),
      col("b0").as("x0_17"), col("b1").as("x17_18"),
      col("b2").as("x18_52"), col("b3").as("x52_plus"),
      col("tot").as("total_all"),
      when(col("tot") > 0, (col("b0") + col("b1")) / col("tot")).otherwise(0.0)
        .as("percent_within_18_weeks_column_bj_column_bi"),
      lit("Q99").as("sha"), lit("incomplete").as("pathway"))

  /** jan11-mar13 specialty sheet (20 specialties + the IP999 Total row the
    * summary joins onto) and provider-summary sheet (95th percentile).
    */
  private def v2Spec: DataFrame =
    withMeasures(grid.filter(col("m") >= 48 && col("m") < 75)).select(
      col("fname"), col("org_code"), col("trust_name").as("provider_name"),
      col("date"), col("tfc").as("treatment_function_code"),
      col("tf").as("treatment_function"),
      col("b0").as("x0_17"), col("b1").as("x17_18"),
      col("b2").as("x18_52"), col("b3").as("x52_plus"),
      col("tot").as("total_number_of_incomplete_pathways"))

  private def v2Summary: DataFrame =
    withMeasures(grid.filter(col("m") >= 48 && col("m") < 75 && col("s") === nSpecs))
      .select(
        col("fname"), col("org_code"), col("trust_name").as("provider_name"),
        col("date"),
        ((col("h") % 80).cast("double") / 4.0).as("x95th_percentile_waiting_time_in_weeks"),
        lit("Q99").as("sha_code"))

  /** apr13+ staged shape: 52-plus harmonisation inputs (a 52_53 band and a
    * 104-week total to drop, total_52_plus_weeks to re-band) plus a
    * regional column the program pattern-drops.
    */
  private def v3Staged: DataFrame =
    withMeasures(grid.filter(col("m") >= 75 && col("s") < nSpecs)).select(
      col("fname"), col("org_code").as("provider_code"),
      col("trust_name").as("provider_name"), col("date"),
      col("tfc").as("treatment_function_code"), col("tf").as("treatment_function"),
      col("b0").as("x0_17"), col("b1").as("x17_18"), col("b2").as("x18_52"),
      (col("h") % 3).cast("double").as("x52_53"),
      col("b3").as("total_52_plus_weeks"),
      (col("h") % 2).cast("double").as("total_104_plus_weeks"),
      lit("Y54").as("region_code"),
      col("tot").as("total_number_of_incomplete_pathways"))

  private def lookup: DataFrame = {
    import spark.implicits._
    (0 until nTrusts / 50).flatMap { k =>
      val base = k * 50
      Seq(
        (f"T${base + 1}%03d", f"T$base%03d", 0, 0),
        (f"T${base + 2}%03d", f"T$base%03d", 0, 0),
        (f"T${base + 3}%03d", f"T${base + 4}%03d", 0, 1))
    }.toDF("old_code", "final_code", "experiences_split", "problematic")
  }

  private lazy val out1 = WaitTimesVintages.jan07Dec10(v1Staged, "incomplete")
  private lazy val out2 = WaitTimesVintages.jan11Mar13(v2Summary, v2Spec, "incomplete")
  private lazy val out3 = WaitTimesVintages.apr13Today(v3Staged, "incomplete")

  private lazy val panel = Relational.unionByNameFill(Seq(out1, out2, out3))
    .withColumn("year", year(col("date")))
    .cache()

  private lazy val adjusted =
    WaitTimes.adjust(panel, lookup, "incomplete", bands).cache()

  // rows/trust: 20 specs × 135 months + 27 V2 IP999 months
  private val rowsPerTrust = nSpecs * nMonths + 27

  test("vintage programs harmonise to identical canonical shapes at scale") {
    val keyCols = Set("fname", "org_code", "org_name", "date",
      "treatment_function_code", "treatment_function")
    val v1Cols = keyCols ++ bands + totalCol + pctCol
    assert(out1.columns.toSet == v1Cols)
    // jan11 drops fname (two-sheet join) and adds the summary percentile
    assert(out2.columns.toSet ==
      (keyCols - "fname") ++ bands + totalCol +
        "incomplete_95th_percentile_waiting_time_in_weeks")
    // apr13: 52+ bands re-banded, 104-week/regional columns gone
    assert(out3.columns.toSet == keyCols ++ bands + totalCol)
    assert(out1.count() == nTrusts.toLong * nSpecs * 48)      // 576,000
    assert(out2.count() == nTrusts.toLong * (nSpecs + 1) * 27) // 340,200
    assert(out3.count() ==
      nTrusts.toLong * nSpecs * 60 - 24L * nSpecs * (nMonths - cutoffMonth)) // 712,800
    assert(panel.count() == 1629000L)
  }

  test("jan07 percent-NA rule holds across the corpus: null iff all-zero month") {
    // generator: raw percent is 0.0 exactly when total is 0, so the rule
    // must null exactly the zero-total rows
    assert(out1.filter(col(totalCol) === 0 && col(pctCol).isNotNull).count() == 0)
    assert(out1.filter(col(totalCol) =!= 0 && col(pctCol).isNull).count() == 0)
    assert(out1.filter(col(totalCol) === 0).count() > 0,
      "the corpus must actually contain all-zero months for the rule to bite")
  }

  test("re-keyed panel has the exact expected row count and a unique grain") {
    // 564 untouched trusts keep every row; 12 successor trusts aggregate
    // their own + both merged old codes into one row per (date, specialty)
    assert(adjusted.count() == 576L * rowsPerTrust) // 1,570,752
    assert(adjusted.select(col("org_code"), col("date"),
      col("treatment_function_code")).distinct().count() == 576L * rowsPerTrust)
    // re-keyed old codes never appear in the output
    assert(adjusted.filter((substring(col("org_code"), 2, 3).cast("int") % 50).isin(1, 2))
      .count() == 0)
  }

  test("every band and total measure is summed exactly once under re-keying") {
    val sums = (bands :+ totalCol).map(c => sum(col(c)).as(c))
    val before = panel.agg(sums.head, sums.tail: _*).head()
    val after = adjusted.agg(sums.head, sums.tail: _*).head()
    (bands :+ totalCol).zipWithIndex.foreach { case (c, i) =>
      assert(before.getDouble(i) == after.getDouble(i),
        s"$c must be preserved exactly under the merge aggregation")
    }
  }

  test("problematic changes are flagged on both codes and never merged") {
    val prob = adjusted.filter(col("exp_problematic_org_change") === 1)
    assert(prob.count() == 24L * rowsPerTrust) // residues 3 and 4 × 12 blocks
    assert(prob.select(col("org_code")).distinct().count() == 24)
    assert(prob.filter(!(substring(col("org_code"), 2, 3).cast("int") % 50).isin(3, 4))
      .count() == 0)
  }

  test("percent and binned median re-derive correctly on EVERY merged row") {
    val succ = adjusted
      .filter((substring(col("org_code"), 2, 3).cast("int") % 50) === 0)
    assert(succ.count() == 12L * rowsPerTrust)

    val b0 = col(bands(0)); val b1 = col(bands(1))
    val b2 = col(bands(2)); val tot = col(totalCol)
    // percent: cumulative at the literal 17-18 band, only when that band
    // is non-zero (R:521-526); a two-term sum of integral doubles then one
    // division — the exact arithmetic the window path performs
    val expPct = when(b1 =!= 0d, (b0 + b1) / tot)
    // median: first band whose cumulative share crosses 0.5, EXCEPT a
    // bin-0 crossing (the lag arm can never fire there, R:527-529);
    // 2·cum ⋚ total replays cum/total ⋚ 0.5 exactly for integral doubles
    val expMed = when(tot === 0d, lit(null).cast("double"))
      .when(b0 * 2 >= tot, lit(null).cast("double"))
      .when((b0 + b1) * 2 >= tot, 17.5)
      .when((b0 + b1 + b2) * 2 >= tot, 18.5)
      .otherwise(52.5)

    val mismatches = succ.filter(
      !(col(pctCol) <=> expPct) || !(col(medCol) <=> expMed))
    assert(mismatches.count() == 0,
      "derived percent/median must match the closed-form expectation on all merged rows")
    // and the derivations are non-degenerate across the corpus
    assert(succ.filter(col(medCol).isNotNull).count() > 0)
    assert(succ.filter(col(medCol).isNull).count() > 0)
    assert(succ.filter(col(pctCol).isNotNull).count() > 0)
  }

  test("merger change indicator lands one month after the last old period") {
    val flagged = adjusted.filter(col("org_change") === 1)
    // old codes stop at month 119 (2016-12); the indicator points at
    // 2017-01, where each successor has one row per real specialty
    assert(flagged.count() == 12L * nSpecs)
    val dates = flagged.select(col("date")).distinct().collect().map(_.getDate(0).toString)
    assert(dates.toSeq == Seq("2017-01-01"))
    assert(flagged.filter((substring(col("org_code"), 2, 3).cast("int") % 50) =!= 0)
      .count() == 0)
  }
}
