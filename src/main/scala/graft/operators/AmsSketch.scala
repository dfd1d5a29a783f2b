package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AMS / Count-Sketch second-moment machinery (Alon, Matias, Szegedy
  * 1996; Charikar et al. 2002): depth × width signed counters
  * c[j][b] = Σ_{h_j(x)=b} sign_j(x) over value OCCURRENCES. Two
  * estimators fall out:
  *
  *   - F₂ = Σ_v freq(v)² (the SELF-join size / skew measure): each
  *     row's Σ_b c[j][b]² is an unbiased estimate; the median over
  *     depth rows concentrates it.
  *   - JOIN SIZE |A ⋈ B| = Σ_v freqA(v)·freqB(v): the inner product
  *     Σ_b cA[j][b]·cB[j][b] of two sketches built with the SAME hash
  *     functions — the planner-grade cardinality estimate that lets an
  *     optimizer size a skewed join without touching either table.
  *
  * Everything is exactly replayable: counters are COMMUTATIVE integer
  * sums (partition/merge-order free), the per-row estimates are exact
  * long sums of products, and the median over an odd depth is a pure
  * rank pick — no floats anywhere, so DuckDB reproduces the estimates
  * bit-for-bit (q144/q145). Hashes are the portable-60 family: bucket
  * = h mod width, sign from bit 20 of the same hash.
  *
  * Scale shape: the sketch is one map-side-combined groupBy over
  * (depth × width) keys — the exchange carries ≤ depth·width·partitions
  * rows no matter the input; the estimate folds depth·width rows.
  */
object AmsSketch {

  /** Signed counters of one column: (j, bucket, c), depth × width rows. */
  def counters(df: DataFrame, valueCol: String, depth: Int,
               width: Int): DataFrame = {
    require(depth >= 1 && depth % 2 == 1, "depth must be odd (median pick)")
    require(width >= 2, "width must be >= 2")
    val h = PortableHash.hash60(
      concat_ws(":", col("__j").cast("string"), col(valueCol).cast("string")))
    df.select(col(valueCol),
        explode(sequence(lit(0), lit(depth - 1))).as("__j"))
      .select(col("__j").as("j"), pmod(h, lit(width.toLong)).as("bucket"),
        (lit(1L) - lit(2L) * shiftright(h, 20).bitwiseAND(lit(1L))).as("s"))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("s")).as("c"))
  }

  /** The median-of-rows fold shared by both estimators: one estimate
    * per depth row (rows with no surviving cells count as 0 — the
    * j-spine left join guarantees exactly `depth` rows), rank-picked
    * middle over depth·1 rows — trivially single-task.
    */
  private def medianOfRows(perRow: DataFrame, estCol: String,
                           depth: Int): DataFrame = {
    val spine = perRow.sparkSession.range(depth).select(col("id").cast("int").as("j"))
    val padded = spine.join(perRow, Seq("j"), "left")
      .select(col("j"), coalesce(col(estCol), lit(0L)).as(estCol))
    val w = Window.orderBy(col(estCol), col("j"))
    padded.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === (depth + 1) / 2)
      .select(col(estCol))
  }

  /** Single-row (f2_est, f2_exact): the estimated and exact self-join
    * size of `valueCol`'s frequency vector. The exact column is the
    * q84 audit discipline — omit in production.
    */
  def f2(df: DataFrame, valueCol: String, depth: Int = 5,
         width: Int = 256): DataFrame = {
    val perRow = counters(df, valueCol, depth, width)
      .groupBy(col("j")).agg(sum(col("c") * col("c")).as("f2_est"))
    val est = medianOfRows(perRow, "f2_est", depth)
    val exact = df.groupBy(col(valueCol)).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n")).as("f2_exact"))
    est.crossJoin(exact)
  }

  /** Single-row (join_est, join_exact): the estimated and exact
    * equi-join cardinality between `a.colA` and `b.colB` — the inner
    * product of the two frequency vectors, estimated from two
    * depth×width sketches without joining the tables.
    */
  def joinSize(a: DataFrame, colA: String, b: DataFrame, colB: String,
               depth: Int = 5, width: Int = 256): DataFrame = {
    val ca = counters(a, colA, depth, width)
      .select(col("j"), col("bucket"), col("c").as("ca"))
    val cb = counters(b, colB, depth, width)
      .select(col("j"), col("bucket"), col("c").as("cb"))
    val perRow = ca.join(cb, Seq("j", "bucket"))
      .groupBy(col("j")).agg(sum(col("ca") * col("cb")).as("join_est"))
    val est = medianOfRows(perRow, "join_est", depth)
    val fa = a.groupBy(col(colA).as("k")).agg(count(lit(1)).as("na"))
    val fb = b.groupBy(col(colB).as("k")).agg(count(lit(1)).as("nb"))
    val exact = fa.join(fb, "k")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("join_exact"))
    est.crossJoin(exact)
  }
}
