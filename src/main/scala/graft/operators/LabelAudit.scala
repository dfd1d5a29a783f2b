package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neighbor-vote label audit — the label-ERROR-detection move of the
  * confident-learning family (Northcutt et al. 2021): a labeled example
  * whose nearest neighbors vote for a DIFFERENT label is the candidate a
  * relabeling pass (human or model) reviews first. Runs over the
  * persisted cluster-local k-NN graph ([[KnnGraph.clusterLocalKnn]] —
  * the linear pair space), so auditing a corpus costs two node-keyed
  * joins, one (point, label) count, and one per-point argmax — nothing
  * quadratic, nothing float.
  *
  * Vote rule (total, replayable): majority label among the point's
  * graph neighbors, ties broken by the SMALLEST label (count DESC,
  * label ASC — the q228 tiebreak discipline). `suspect` = own label ≠
  * voted label; null (not false) when the point has no graph neighbors
  * to vote (§1.4 null policy — absence of evidence is not agreement).
  */
object LabelAudit {

  /** @param graph  (idCol, neighbor_id, ...) rows — a
    *               [[KnnGraph.clusterLocalKnn]] result (or any neighbor
    *               edge list)
    * @param labels (idCol, labelCol) — one row per labeled point
    * @return one row per labeled point: (idCol, own_label, voted_label,
    *         n_votes, suspect)
    */
  def neighborVote(graph: DataFrame, labels: DataFrame, idCol: String,
                   labelCol: String): DataFrame = {
    val lbl = labels.select(col(idCol).as("__lid"), col(labelCol).as("__l"))
    val votes = graph.select(col(idCol), col("neighbor_id"))
      .join(lbl, col("neighbor_id") === col("__lid"))
      .groupBy(col(idCol), col("__l")).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__n").desc, col("__l").asc)
    val top = votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__l").as("voted_label"),
        col("__n").as("n_votes"))
    labels.select(col(idCol), col(labelCol).as("own_label"))
      .join(top, Seq(idCol), "left")
      .withColumn("suspect",
        when(col("voted_label").isNotNull,
          col("voted_label") =!= col("own_label")))
  }
}
