package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J7 — iterative successor resolution: the transitive closure of an edge
  * list (reference: scripts/org-changes/build_trust_lookup.R:66-84 while-loop;
  * scripts/org-changes/build_all_org_changes.R:62-106 bounded 10 iterations).
  *
  * Re-expressed with pointer doubling over the *edge* relation: iteration k
  * holds a mapping m(x) = the up-to-2^k-step successor of x (terminal
  * absorbed), built by composing m with itself. Multi-successor "splits"
  * multiply rows naturally through the self-join (the reference's `unnest`,
  * build_all_org_changes.R:96).
  *
  * Scale posture: succession chains are edge-list-sized (~700 rows in the
  * reference) while the node table being re-keyed can be arbitrarily large.
  * Pointer doubling runs O(log depth) tiny self-joins on the edge set, then
  * exactly ONE broadcast join against the distributed node table — zero
  * shuffles of the big side. `localCheckpoint` truncates lineage per
  * iteration; iterations are bounded to guard against cyclic input.
  */
object Closure {

  /** Resolve every `node` to its terminal successor(s).
    *
    * Each iteration materializes onto a *fresh cached-RDD leaf*.
    * `localCheckpoint` is not enough: Spark 4 carries the child plan's
    * statistics onto the checkpointed node
    * (`LogicalRDD.rewriteStatsAndConstraints`), so a self-join loop squares
    * the BigInt sizeInBytes every iteration until stats arithmetic itself
    * hangs the planner. A cached RDD re-wrapped via `createDataFrame` resets
    * stats to the leaf default each round. The superseded iteration's cache
    * is released as soon as its successor materializes, and the converged
    * mapping — broadcast-sized by construction, it feeds a broadcast join —
    * is collected into a local relation, so `resolve` retains zero executor
    * storage after it returns.
    *
    * @param nodes single-column frame `node`
    * @param edges two-column frame `src`, `dst`; rows multiply on splits
    * @return frame (`old_code`, `final_code`, `hops`)
    */
  def resolve(nodes: DataFrame, edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    // mapping m: src → (dst, hops) after following up to 2^k edges
    val m0 = edges.select(col("src"), col("dst"), lit(1).as("hops"))
    var mRdd = m0.rdd
    mRdd.cache()
    mRdd.count()
    var m = spark.createDataFrame(mRdd, m0.schema)
    var iter = 0
    var extending = true
    while (extending && iter < maxIter) {
      val a = m.select(col("src"), col("dst"), col("hops"))
      val b = m.select(col("src").as("b_src"), col("dst").as("b_dst"), col("hops").as("b_hops"))
      val composed = a.join(b, a("dst") === b("b_src"), "left")
        .select(
          col("src"),
          coalesce(col("b_dst"), col("dst")).as("dst"),
          (col("hops") + coalesce(col("b_hops"), lit(0))).as("hops"),
          col("b_src").isNotNull.as("extended"))
      // one pass materializes AND detects convergence: the extension count
      // rides an accumulator on the caching job (only compared to zero, so
      // task-retry over-counting is harmless)
      val acc = composed.sparkSession.sparkContext.longAccumulator("closure-extended")
      val rdd = composed.rdd.map { r => if (r.getBoolean(3)) acc.add(1L); r }
      rdd.cache()
      rdd.count()
      extending = acc.value > 0
      mRdd.unpersist(blocking = false) // release the superseded iteration
      mRdd = rdd
      m = composed.sparkSession.createDataFrame(rdd, composed.schema).drop("extended")
      iter += 1
    }
    require(!extending,
      s"Closure.resolve: still extending after $maxIter doublings (cyclic edges?)")
    // The mapping is joined by broadcast below, so it already has to fit on
    // the driver: collect it into a local relation and release the final
    // iteration's cache instead of letting it outlive the call.
    val rows = m.collect()
    mRdd.unpersist(blocking = false)
    val local = spark.createDataFrame(java.util.Arrays.asList(rows: _*), m.schema)
    nodes
      .join(broadcast(local), nodes("node") === local("src"), "left")
      .select(
        col("node").as("old_code"),
        coalesce(col("dst"), col("node")).as("final_code"),
        coalesce(col("hops"), lit(0)).as("hops"))
  }
}
