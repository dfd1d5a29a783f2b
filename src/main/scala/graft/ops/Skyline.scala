package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D Pareto front (skyline) — the maxima of a point set under
  * coordinate-wise dominance (Börzsönyi et al. 2001, "The Skyline
  * Operator"): a point survives iff no other point is >= in both
  * coordinates and > in one. The data-selection primitive: "documents
  * not dominated on (length, lexical diversity)" picks the quality
  * frontier without committing to a weighting between the axes.
  *
  * The classic formulation is a quadratic NOT EXISTS self-join; in 2-D
  * it collapses to a SORT + RUNNING MAX: reduce to one candidate per
  * distinct x (the max-y — anything below is dominated within its own
  * column), order by x DESCENDING, and a candidate is on the front iff
  * its y exceeds every y seen so far (all of which have strictly
  * greater... >= x; the within-x max reduction settles the tie case).
  * The running max is [[PrefixSum.runningMax]]'s two-phase
  * decomposition — range partition + per-partition seeds — so no
  * single-task window ever sees the data; equal-max ties collapse to
  * the highest-x achiever by one more tiny aggregate.
  *
  * All-integer, so the front replays exactly.
  */
object Skyline {

  /** @return the Pareto-MAXIMAL points of (`xCol`, `yCol`) as
    *         (x, y, n_rows) — n_rows = how many input rows sit exactly
    *         on that front point.
    */
  def paretoFront2D(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val pts = df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n_rows"))
    // one candidate per x: the within-column max y
    val perX = pts.groupBy(col("x")).agg(max(col("y")).as("y"))
    // inclusive running max of y over x DESC; a candidate whose y equals
    // the running max is the max-so-far — and of the rows sharing one
    // max value, only the FIRST achiever (highest x) is undominated
    val withM = PrefixSum.runningMax(perX, Nil, Seq(col("x").desc),
      col("y"), out = "__m")
    val sky = withM.filter(col("y") === col("__m"))
      .groupBy(col("__m")).agg(max(col("x")).as("x"))
      .select(col("x"), col("__m").as("y"))
    sky.join(pts, Seq("x", "y")).select(col("x"), col("y"), col("n_rows"))
  }
}
