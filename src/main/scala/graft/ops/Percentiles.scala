package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact percentiles (continuous interpolation) per group.
  *
  * Spark's built-in exact `percentile` aggregate keeps EVERY distinct
  * value+count in the aggregation state and reduces each group on a single
  * task — with a handful of groups that is an all-values-in-memory reduce
  * with parallelism = |groups|, which OOMs long before 100 TB.
  *
  * This operator computes the same values with shuffle-parallel primitives:
  *
  *  1. `groupBy(group, value).count()` — a map-side-combinable aggregation
  *     hashed across ALL shuffle partitions (the heavy, full-data stage);
  *  2. a cumulative-count window over the (much smaller) distinct-value
  *     table to locate, per requested quantile, the two values straddling
  *     the target rank;
  *  3. linear interpolation between them.
  *
  * The interpolation formula mirrors Spark's `Percentile.getPercentile`
  * (and DuckDB's `quantile_cont`, which is bit-identical to it):
  * `pos = p*(n-1); lo = floor(pos); hi = ceil(pos);
  *  result = if (lo == hi) v[lo] else (hi-pos)*v[lo] + (pos-lo)*v[hi]`
  * with zero-based ranks over the value-ordered multiset.
  *
  * Stage 2's window sorts only distinct values per group; Spark's window
  * operator external-sorts, so the per-group state never has to fit in
  * memory. Nulls in the value column are excluded, matching both Spark's
  * `percentile` and DuckDB's `quantile_cont`.
  */
object Percentiles {

  /** @param qs (outputColumn, quantile in [0,1]) pairs
    * @return one row per group: groupCols ++ qs output columns (double)
    */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, p) => p >= 0 && p <= 1 },
      "quantiles must lie in [0,1]")
    val gcols = groupCols.map(col)
    val counts = df
      .filter(col(valueCol).isNotNull)
      .select((gcols :+ col(valueCol).cast("double").as("__v")): _*)
      .groupBy((gcols :+ col("__v")): _*)
      .agg(count(lit(1)).as("__n"))

    val ordered = Window.partitionBy(gcols: _*).orderBy(col("__v"))
    // zero-based rank range covered by this distinct value: [__c0, __cum);
    // the group total rides an unbounded frame on the SAME (partition,
    // order) spec so both sums plan as ONE WindowExec pass (an unordered
    // partitionBy spec planned a second Window operator + sort)
    val withRanks = counts
      .withColumn("__cum", sum(col("__n"))
        .over(ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__c0", col("__cum") - col("__n"))
      .withColumn("__total", sum(col("__n")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))

    val aggs = qs.flatMap { case (name, p) =>
      val pos = lit(p) * (col("__total") - 1).cast("double")
      val lo = floor(pos).cast("long")
      val hi = ceil(pos).cast("long")
      val vLo = max(when(col("__c0") <= lo && lo < col("__cum"), col("__v")))
      val vHi = max(when(col("__c0") <= hi && hi < col("__cum"), col("__v")))
      Seq(vLo.as(s"__lo_$name"), vHi.as(s"__hi_$name"),
        max(pos).as(s"__pos_$name"))
    }
    val picked = withRanks.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)

    val outCols = gcols ++ qs.map { case (name, _) =>
      val pos = col(s"__pos_$name")
      val lo = floor(pos)
      val hi = ceil(pos)
      when(lo === hi, col(s"__lo_$name"))
        .otherwise((hi - pos) * col(s"__lo_$name") + (pos - lo) * col(s"__hi_$name"))
        .as(name)
    }
    picked.select(outCols: _*)
  }

  /** DISCRETE exact quantiles: the data value at 0-based rank
    * ⌊p·(n−1)⌋ of the value-ordered multiset — no interpolation, so
    * every returned threshold IS a data value and integer-metric
    * comparisons against it replay bit-identically across engines. The
    * interpolated form ([[exactQuantiles]]) can land within an ulp of
    * an integer when the two engines associate the interpolation
    * differently, and an ulp across an integer boundary flips a
    * `metric > threshold` decision — fine for clip OUTPUTS (q91's
    * round-6 discipline) but not for scoring CUTS (q203's RFM
    * quintiles). Same two-stage shape as [[exactQuantiles]]: the heavy
    * stage is the shuffle-parallel (group, value) count; the rank
    * window sorts only DISTINCT values per group (for giant distinct
    * domains, pre-quantize the metric first).
    */
  def exactQuantilesDisc(df: DataFrame, groupCols: Seq[String],
                         valueCol: String,
                         qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, p) => p >= 0 && p <= 1 },
      "quantiles must lie in [0,1]")
    val gcols = groupCols.map(col)
    val counts = df
      .filter(col(valueCol).isNotNull)
      .select((gcols :+ col(valueCol).cast("double").as("__v")): _*)
      .groupBy((gcols :+ col("__v")): _*)
      .agg(count(lit(1)).as("__n"))
    val part = Window.partitionBy(gcols: _*)
    val ordered = part.orderBy(col("__v"))
    val withRanks = counts
      .withColumn("__cum", sum(col("__n"))
        .over(ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__c0", col("__cum") - col("__n"))
      .withColumn("__total", sum(col("__n")).over(part))
    val aggs = qs.map { case (name, p) =>
      // ⌊p·(n−1)⌋: one IEEE multiply + floor, evaluated identically by
      // any engine from the same p literal and exact long n
      val pos = floor(lit(p) * (col("__total") - 1).cast("double")).cast("long")
      max(when(col("__c0") <= pos && pos < col("__cum"), col("__v"))).as(name)
    }
    withRanks.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Winsorization — clip `valueCol` to its group's [pLo, pHi] exact
    * quantiles (the outlier-clipping step before feature scaling or loss
    * weighting). The bounds table is one row per group
    * ([[exactQuantiles]] — shuffle-parallel, never a single-task
    * reduce), broadcast back over the data for a map-side clip; nulls
    * pass through unclipped (both engines' `greatest` would otherwise
    * SKIP the null and resurrect a bound).
    *
    * Cross-engine note: comparisons against an interpolated bound are
    * ulp-safe — a non-integral-rank bound lies strictly between two
    * adjacent distinct data values, so a final-ulp difference cannot
    * flip any row's clip decision; only a row OUTPUT at the bound
    * carries the interpolation ulp (the q40 round-6 precedent applies
    * to the gate's output).
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                pLo: Double, pHi: Double, out: String): DataFrame = {
    require(pLo >= 0 && pLo < pHi && pHi <= 1,
      s"need 0 <= pLo < pHi <= 1: $pLo, $pHi")
    val bounds = exactQuantiles(df, groupCols, valueCol,
      Seq("__wlo" -> pLo, "__whi" -> pHi))
    df.join(broadcast(bounds), groupCols)
      .withColumn(out,
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(least(greatest(col(valueCol).cast("double"),
            col("__wlo")), col("__whi"))))
      .drop("__wlo", "__whi")
  }

  /** Per-group min-max scaling to [0, 1] — the deterministic feature
    * normalization (z-score needs a variance whose floating SUM depends
    * on partial-aggregation order; min/max are exact and the single
    * division is correctly-rounded IEEE, so the scaled values are
    * bit-identical across runs, partitionings, and engines). One
    * map-side-combined bounds aggregation broadcast back; a constant
    * group (max = min) scales to 0.0 by convention; nulls pass through.
    */
  def minMaxScale(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  out: String): DataFrame = {
    val gcols = groupCols.map(col)
    val bounds = df.filter(col(valueCol).isNotNull)
      .groupBy(gcols: _*)
      .agg(min(col(valueCol).cast("double")).as("__mn"),
        max(col(valueCol).cast("double")).as("__mx"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(out,
        when(col(valueCol).isNull, lit(null).cast("double"))
          .when(col("__mx") === col("__mn"), lit(0.0))
          .otherwise((col(valueCol).cast("double") - col("__mn")) /
            (col("__mx") - col("__mn"))))
      .drop("__mn", "__mx")
  }

  /** Per-group population z-score from EXACT integer moments — the
    * standardization scaler that is bit-identical across runs,
    * partitionings, and engines, which no naive float implementation is
    * (a float mean/variance sums doubles in partition order). The trick:
    * for integer values,
    *
    *   z = (x − S/n) / (σ) = (n·x − S) / sqrt(n·Q − S²)
    *
    * where S = Σx and Q = Σx² are EXACT long sums (map-side combined),
    * so the only floating arithmetic is one correctly-rounded sqrt and
    * one correctly-rounded division — identical in every IEEE-754
    * engine. Zero-variance groups emit 0.0.
    *
    * Overflow bound: n·Q must fit a long — for values |x| ≤ V that is
    * n² · V² < 2^63, e.g. V = 50 allows n ≈ 6·10⁷ rows per group; above
    * that, pre-scale the values down or split groups (documented, not
    * silently widened — decimal arithmetic would change the parity
    * story).
    */
  /** Robust outlier detection via the Median Absolute Deviation: per
    * group, z_rob = (x − median) / (1.4826·MAD) with MAD =
    * median(|x − median|) — the standard robust scale (1.4826 ≈ 1/Φ⁻¹(¾)
    * makes it consistent with σ under normality) that a mean/stddev
    * z-score cannot provide, because the outliers being hunted corrupt
    * the mean and stddev themselves (breakdown point 0 vs MAD's 50%).
    *
    * Two [[exactQuantiles]] passes (shuffle-parallel, never a single-task
    * percentile reduce) with group-row bounds broadcast back — the
    * two-scan shape is inherent to the statistic (the deviation needs the
    * median first). Cross-engine parity: there are NO data sums anywhere —
    * medians pick or midpoint-average identical input doubles, the
    * deviation is one subtraction, the score one multiply and one divide —
    * so every engine computes bit-identical scores for arbitrary double
    * inputs (integrality is not required, unlike the moment-based ops).
    * Zero-MAD groups (≥50% of the group at the median) yield null scores:
    * the statistic is undefined there, and both engines would otherwise
    * produce division artifacts that disagree.
    */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  threshold: Double, out: String = "robust_z"): DataFrame = {
    val meds = exactQuantiles(df, groupCols, valueCol, Seq("__med" -> 0.5))
    // persisted: the MAD quantile pass AND the scored output both read
    // this frame — unpersisted, the input scan + median broadcast join
    // re-ran per consumer (caller releases via graft.Storage.releaseAll,
    // the Verify/Bench contract)
    val withMed = df.join(broadcast(meds), groupCols)
      .withColumn("__absdev",
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(abs(col(valueCol).cast("double") - col("__med"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mads = exactQuantiles(withMed, groupCols, "__absdev", Seq("__mad" -> 0.5))
    withMed.join(broadcast(mads), groupCols)
      .withColumn(out,
        when(col(valueCol).isNull || col("__mad") === 0d, lit(null).cast("double"))
          .otherwise((col(valueCol).cast("double") - col("__med")) /
            (lit(1.4826) * col("__mad"))))
      .withColumn("is_outlier",
        when(col(out).isNull, lit(null).cast("boolean"))
          .otherwise(abs(col(out)) > threshold))
      .drop("__absdev", "__med", "__mad")
  }

  /** Integer percentile-rank (cume_dist) normalization per group:
    * pr_ppm = ⌊10⁶ · #{group rows with value ≤ x} / n_group⌋ — the
    * calibration that makes heterogeneous per-source quality scores
    * comparable BEFORE a global cut ("keep everyone's top 20%" =
    * pr_ppm > 800000 uniformly), where raw-score cuts would let one
    * source's generous scorer flood the mix. Ties share a rank (equal
    * scores must calibrate equally — a row_number form would split
    * them arbitrarily), and the arithmetic is exact integer floor
    * division: no float percentile, no interpolation, replays
    * bit-identically (z-score/min-max are the float siblings;
    * [[exactQuantilesDisc]] is the cut-point view of the same rank
    * structure).
    *
    * Scale shape (the exactQuantiles discipline): the heavy stage is
    * the map-side-combinable (group, value) count; the cumulative
    * window runs over DISTINCT values per group, not rows, and the
    * result joins back value-level. No row-level window, no
    * single-task group reduce.
    *
    * @return the input columns plus `out` (long ppm in (0, 10⁶]);
    *         null values pass through with null rank (§1.4)
    */
  def percentileRankPpm(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, out: String): DataFrame = {
    val gAlias = groupCols.zipWithIndex.map { case (g, i) => g -> s"__g$i" }
    val counts = df.filter(col(valueCol).isNotNull)
      .select(gAlias.map { case (g, a) => col(g).as(a) } :+
        col(valueCol).as("__v"): _*)
      .groupBy((gAlias.map(p => col(p._2)) :+ col("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val ordered = Window.partitionBy(gAlias.map(p => col(p._2)): _*)
      .orderBy(col("__v"))
    // group total on the same (partition, order) spec — one WindowExec
    val ranks = counts
      .withColumn("__le", sum(col("__c"))
        .over(ordered
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__c")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(gAlias.map(p => col(p._2)) :+ col("__v") :+
        graft.functions.IntOps.intDiv(col("__le") * 1000000L, col("__n"))
          .as(out): _*)
    val cond = (gAlias.map { case (g, a) => col(g) === col(a) } :+
      (col(valueCol) === col("__v"))).reduce(_ && _)
    df.join(ranks, cond, "left")
      .drop("__v")
      .drop(gAlias.map(_._2): _*)
  }

  /** Quantile normalization onto a `grid`-point reference — the
    * batch-effect remover: every row's value is replaced by the GLOBAL
    * value at (the grid rounding of) its within-group percentile rank,
    * so every group's normalized distribution is the same reference
    * distribution and one downstream threshold means the same thing in
    * every source. The classic from expression-array statistics (Bolstad
    * et al. 2003), reformulated for distributed exactness:
    *
    *   - group rank: grid point gp = ⌈le·G / n⌉ per (group, value) via
    *     cross-multiplied exact longs (le = ties-share cumulative count —
    *     q249's cume_dist discipline without the ppm intermediary, so no
    *     resolution floor);
    *   - reference: the global inverse CDF materialized ONCE as exactly G
    *     rows — each distinct global value covers the grid interval
    *     (⌊le₀·G/n⌋, ⌊le·G/n⌋] and a sequence-explode emits its points;
    *   - the lookup is then a plain EQUI-join on the grid index against a
    *     G-row broadcast — a hash join, not the interval/nested-loop
    *     shape a raw inverse-CDF lookup would force. G bounds resolution
    *     AND plan cost by construction.
    *
    * Null values pass through with a null normalized column. All rank
    * arithmetic is exact integers; the reference value is served verbatim
    * (no interpolation), so the gate hash-compares with no float risk.
    * The reference CDF window runs over DISTINCT values (one task) — the
    * usual discrete/pre-binned contract; quantile-normalizing a truly
    * continuous column should bin it first (the histogram family's move).
    */
  def quantileNormalize(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, grid: Int, out: String): DataFrame = {
    require(grid >= 1, "grid must be >= 1")
    val g = lit(grid.toLong)
    val gAlias = groupCols.zipWithIndex.map { case (c, i) => c -> s"__g$i" }
    // within-group grid point per distinct value (ties share a rank)
    val counts = df.filter(col(valueCol).isNotNull)
      .select(gAlias.map { case (c, a) => col(c).as(a) } :+
        col(valueCol).as("__v"): _*)
      .groupBy((gAlias.map(p => col(p._2)) :+ col("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val part = Window.partitionBy(gAlias.map(p => col(p._2)): _*)
    val ranked = counts
      .withColumn("__le", sum(col("__c"))
        .over(part.orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__c")).over(part))
      .select(gAlias.map(p => col(p._2)) :+ col("__v") :+
        graft.functions.IntOps.intDiv(
          col("__le") * g + col("__n") - 1, col("__n")).as("__gp"): _*)
    // the G-row global reference: value __rv serves grid points
    // (⌊le0·G/n⌋, ⌊le·G/n⌋]
    val gCounts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__rv")).agg(count(lit(1)).as("__c"))
    val wAll = Window.partitionBy(lit(1))
    val gRanked = gCounts
      .withColumn("__le", sum(col("__c"))
        .over(wAll.orderBy(col("__rv"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .withColumn("__lo", graft.functions.IntOps.intDiv(
        (col("__le") - col("__c")) * g, col("__n")) + 1)
      .withColumn("__hi", graft.functions.IntOps.intDiv(
        col("__le") * g, col("__n")))
      .filter(col("__hi") >= col("__lo"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("__gp"),
        col("__rv"))
    val cond = (gAlias.map { case (c, a) => col(c) === col(a) } :+
      (col(valueCol) === col("__v"))).reduce(_ && _)
    df.join(ranked, cond, "left")
      .join(broadcast(gRanked), Seq("__gp"), "left")
      .withColumnRenamed("__rv", out)
      .drop("__v", "__gp")
      .drop(gAlias.map(_._2): _*)
  }

  def zscoreExact(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  out: String): DataFrame = {
    val gcols = groupCols.map(col)
    val v = col(valueCol).cast("long")
    val moments = df.filter(col(valueCol).isNotNull)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("__n"), sum(v).as("__s"),
        sum(v * v).as("__q"))
    df.join(broadcast(moments), groupCols)
      .withColumn(out, {
        val disc = col("__n") * col("__q") - col("__s") * col("__s")
        when(col(valueCol).isNull, lit(null).cast("double"))
          .when(disc === 0L, lit(0.0))
          .otherwise((col("__n") * v - col("__s")).cast("double") /
            sqrt(disc.cast("double")))
      })
      .drop("__n", "__s", "__q")
  }
}
