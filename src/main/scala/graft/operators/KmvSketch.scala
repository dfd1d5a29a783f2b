package graft.operators

import graft.functions.{KmvAgg, PortableHash}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV / bottom-k theta sketches (Beyer et al. 2007; the theta-sketch
  * family): distinct counting whose states compose under SET ALGEBRA —
  * union is a merge of minima, intersection follows the min-theta rule —
  * which the HLL registers (operators/HyperLogLog) cannot do for
  * intersections. The per-group state is the k smallest DISTINCT portable
  * 60-bit hashes: a pure function of the value set, independent of
  * arrival order, partitioning, and merge-tree shape, so every estimate
  * below is deterministic and exactly replayable from sorted hashes in
  * any engine.
  *
  * Estimators (exact IEEE trees over exact integer hashes):
  *   - distinct:      n̂ = (k−1)·2⁶⁰ / h_k   (exact count when |set| < k)
  *   - intersection:  n̂ = |A_k ∩ B_k below θ| · 2⁶⁰ / θ,  θ = min(h_k^A, h_k^B)
  *     (exact when both sides are exhaustive)
  *
  * Scale shape: the sketch builds as ONE native TypedImperativeAggregate
  * ([[KmvAgg]]) — each map task ships ≤ k longs regardless of input size.
  * The pair matrix crosses SKETCH ROWS (one per group), never data. The
  * optional exact-verify column is the q84 discipline (the sketch buys
  * the plan; the gate checks the answer) and costs a real distinct — omit
  * it in production.
  */
object KmvSketch {

  /** 2⁶⁰ — the hash domain size; a power of two, exact in a double. */
  val DomainSize = 1152921504606846976L

  /** The KMV estimator over a sorted minima array: exact size below k,
    * else (k−1)·2⁶⁰/h_k. Exposed for sketch-frame consumers
    * ([[IncrementalKmv]]).
    */
  def estimateCol(mins: Column, k: Int): Column =
    when(size(mins) < k, size(mins).cast("double"))
      .otherwise((lit((k - 1).toDouble) * lit(DomainSize.toDouble)) /
        get(mins, size(mins) - 1).cast("double"))

  private def estimate(mins: Column, k: Int): Column = estimateCol(mins, k)

  /** Per-group distinct estimate; `withExact` adds the exact distinct (of
    * the same hash domain) for error auditing.
    */
  def distinctByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      k: Int, withExact: Boolean = false): DataFrame = {
    val h = PortableHash.hash60(col(valueCol))
    val aggs =
      if (withExact) Seq(KmvAgg.minima(h, k).as("__mins"),
        countDistinct(h).as("n_exact"))
      else Seq(KmvAgg.minima(h, k).as("__mins"))
    val g = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val outCols = groupCols.map(col) ++ (estimate(col("__mins"), k).as("n_est") +:
      (if (withExact) Seq(col("n_exact")) else Nil))
    g.select(outCols: _*)
  }

  /** Pairwise distinct-intersection estimates between groups
    * (group_a < group_b). The cross join is over one sketch row per
    * group — group-count², never data².
    */
  def intersectionMatrix(df: DataFrame, groupCol: String, valueCol: String,
                         k: Int): DataFrame =
    intersectionFromSketches(
      df.groupBy(col(groupCol))
        .agg(KmvAgg.minima(PortableHash.hash60(col(valueCol)), k).as("mins")),
      groupCol, k)

  /** [[intersectionMatrix]] over an ALREADY-BUILT sketch frame
    * (groupCol, mins) — the entry point for persisted sketch stores
    * ([[IncrementalKmv]]), where the sketches were merged from batches
    * rather than aggregated from raw values.
    */
  def intersectionFromSketches(sk: DataFrame, groupCol: String,
                               k: Int): DataFrame = {
    val a = sk.select(col(groupCol).as("group_a"), col("mins").as("ma"))
    val b = sk.select(col(groupCol).as("group_b"), col("mins").as("mb"))
    def thetaHash(m: Column) =
      when(size(m) < k, lit(DomainSize)).otherwise(get(m, size(m) - 1))
    val th = least(thetaHash(col("ma")), thetaHash(col("mb")))
    val common = size(filter(array_intersect(col("ma"), col("mb")),
      x => x < th))
    a.crossJoin(b).filter(col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"),
        when(size(col("ma")) < k && size(col("mb")) < k, common.cast("double"))
          .otherwise((common.cast("double") * lit(DomainSize.toDouble)) /
            th.cast("double"))
          .as("inter_est"))
  }
}
