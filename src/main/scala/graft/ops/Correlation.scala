package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pairwise Pearson correlation across k measures in ONE aggregate scan,
  * from EXACT integer moments — the q100 (zscoreExact) discipline extended
  * to the full moment matrix: inputs are integer-valued long columns (the
  * caller scales fixed-decimal measures, e.g. ×100 cents), so n, Σx, Σx²
  * and every Σxy are exact longs whose map-side partials commute, and the
  * Pearson finish
  *
  *   r = (n·Σxy − Σx·Σy) / √((n·Σx² − Σx·Σx)·(n·Σy² − Σy·Σy))
  *
  * is a fixed tree of IEEE double ops on those exact longs — replayable
  * bit-identically by any engine, with no summation-order sensitivity
  * anywhere (the hazard of Welford/built-in corr() at scale).
  *
  * Scale shape: one partial-aggregated scan producing a single
  * 2+2k+k(k−1)/2-column row; the k(k−1)/2 output pairs are a per-row
  * explode of that row — no second scan, no collect, no shuffle beyond the
  * one aggregate exchange. Long-overflow headroom is the caller's contract:
  * Σx² ≤ rows·max², so value magnitudes up to ~3·10⁶ hold exact past 10¹²
  * rows; money-scale columns at petabyte row counts belong in a chunked/
  * decimal variant, and the ANSI overflow error (not a silent wrap) is
  * what enforces the contract.
  */
object Correlation {

  /** @param df    input frame
    * @param measures (name, integer-valued long column) per measure;
    *                 correlations are emitted for every unordered pair in
    *                 the given order.
    * @return (col_x, col_y, n, corr); corr is null when either side has
    *         zero variance (both engines would otherwise hit IEEE edge
    *         cases that don't agree across SQL dialects).
    */
  def matrixExact(df: DataFrame, measures: Seq[(String, Column)]): DataFrame = {
    require(measures.size >= 2, "need at least two measures")
    val names = measures.map(_._1)
    require(names.distinct.size == names.size, "measure names must be unique")

    val base = df.select(measures.map { case (n, c) => c.as(n) }: _*)
    val sums =
      names.map(n => sum(col(n)).as(s"s_$n")) ++
      names.map(n => sum(col(n) * col(n)).as(s"ss_$n")) ++
      names.combinations(2).map { case Seq(a, b) =>
        sum(col(a) * col(b)).as(s"sp_${a}_$b")
      }.toSeq
    val m = base.agg(count(lit(1)).as("n"), sums: _*)

    val nD = col("n").cast("double")
    def varNum(x: String) =
      nD * col(s"ss_$x").cast("double") -
        col(s"s_$x").cast("double") * col(s"s_$x").cast("double")
    val pairs = names.combinations(2).map { case Seq(a, b) =>
      val cov = nD * col(s"sp_${a}_$b").cast("double") -
        col(s"s_$a").cast("double") * col(s"s_$b").cast("double")
      val corr = when(varNum(a) === 0d || varNum(b) === 0d, lit(null).cast("double"))
        .otherwise(cov / sqrt(varNum(a) * varNum(b)))
      struct(lit(a).as("col_x"), lit(b).as("col_y"), col("n").as("n"),
        corr.as("corr"))
    }.toSeq

    m.select(explode(array(pairs: _*)).as("p")).select(col("p.*"))
  }
}
