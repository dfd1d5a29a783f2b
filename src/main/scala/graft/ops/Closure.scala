package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J7 — iterative successor resolution: the transitive closure of an
  * edge list, re-expressed as a driver-controlled loop of broadcast joins
  * (reference: scripts/org-changes/build_trust_lookup.R:66-84 while-loop;
  * scripts/org-changes/build_all_org_changes.R:62-106 bounded 10 iterations).
  *
  * Multi-successor "splits" multiply rows naturally through the join (the
  * reference's `unnest`, build_all_org_changes.R:96).
  *
  * Scale posture: the edge list is lookup-sized (~700 rows in the reference)
  * and is broadcast; the node set stays distributed, so the loop does zero
  * shuffles — each iteration is a map-side broadcast join. `localCheckpoint`
  * per iteration truncates lineage so plans don't grow linearly with chain
  * length (SURVEY §4). Iterations are bounded to guard against cyclic input.
  */
object Closure {

  /** Resolve every `node` to its terminal successor(s).
    *
    * @param nodes single-column frame `node`
    * @param edges two-column frame `src`, `dst`; rows multiply on splits
    * @return frame (`old_code`, `final_code`, `hops`)
    */
  def resolve(nodes: DataFrame, edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    var frontier = nodes
      .select(col("node").as("old_code"), col("node").as("cur"), lit(0).as("hops"))
      .localCheckpoint(true)
    var finishedParts = List.empty[DataFrame]
    var iter = 0
    var remaining = frontier.count()
    while (remaining > 0 && iter < maxIter) {
      val joined = frontier.join(broadcast(e), frontier("cur") === e("src"), "left")
      finishedParts ::= joined
        .filter(col("src").isNull)
        .select(col("old_code"), col("cur"), col("hops"))
        .localCheckpoint(true)
      frontier = joined
        .filter(col("src").isNotNull)
        .select(col("old_code"), col("dst").as("cur"), (col("hops") + 1).as("hops"))
        .localCheckpoint(true)
      iter += 1
      remaining = frontier.count()
    }
    require(remaining == 0,
      s"Closure.resolve: frontier not empty after $maxIter iterations (cyclic edges?)")
    finishedParts.reduce(_ union _).withColumnRenamed("cur", "final_code")
  }
}
