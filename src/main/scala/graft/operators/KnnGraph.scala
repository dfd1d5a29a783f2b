package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Cluster-local k-NN graph construction — the corpus-wide neighbor
  * structure that diversity sampling, semantic clustering QA, and
  * graph-based curation passes all start from (e.g. the SemDeDup family's
  * follow-up analyses run over exactly this artifact).
  *
  * The exact k-NN graph needs all n² cosines; at corpus scale that is
  * never computed. The standard scale shape (the one SemDeDup itself
  * uses — Abbas et al. 2023, the q95 family) restricts neighbors to
  * the point's own k-means cell: with k DERIVED as ceil(n/target) the
  * pair space Σ n_c² stays ≈ n·target — LINEAR in the corpus — and the
  * result is a deterministic, well-defined semantics (neighbors WITHIN
  * the cell), not a heuristic approximation of the global graph. Both
  * engines replay it exactly: the Lloyd chain is the q94 bit-exact
  * fixed-point, cosines round at 6 (the q29 guard), and the per-point
  * ranking breaks ties on neighbor id, so the top-k cut is total.
  *
  * Plan shape: one equi-join on the cell id (shuffle bounded by the
  * linear pair space), one window partitioned by point id. No all-pairs
  * anywhere; the window's partition key is the high-cardinality point id,
  * so no single task sees more than one point's candidate list.
  */
object KnnGraph {

  /** Top-`k` same-cluster cosine neighbors per point.
    *
    * @param points frame carrying id, vector, and cluster columns (the
    *               cluster from [[KMeans.assignAuto]] — derived k keeps
    *               the pair space linear; see object doc)
    * @return (idCol, knn_rank, neighbor_id, cos_sim) — knn_rank 1..k by
    *         (cos_sim DESC, neighbor_id ASC); cos_sim rounded at 6;
    *         zero-norm vectors yield null cosine and are excluded from
    *         both sides' rankings (§1.4 null policy)
    */
  def clusterLocalKnn(points: DataFrame, idCol: String, vecCol: String,
                      clusterCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val a = points.select(col(clusterCol).as("__c"), col(idCol).as("__ida"),
      col(vecCol).as("__va"), VectorFunctions.normSq(col(vecCol)).as("__na"))
    val b = points.select(col(clusterCol).as("__c"), col(idCol).as("__idb"),
      col(vecCol).as("__vb"), VectorFunctions.normSq(col(vecCol)).as("__nb"))
    val w = Window.partitionBy(col("__ida"))
      .orderBy(col("cos_sim").desc, col("__idb").asc)
    a.join(b, "__c")
      .filter(col("__ida") =!= col("__idb"))
      .withColumn("cos_sim", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("__va"), col("__vb")),
        col("__na"), col("__nb")), 6))
      .filter(col("cos_sim").isNotNull)
      .withColumn("knn_rank", row_number().over(w).cast("long"))
      .filter(col("knn_rank") <= k)
      .select(col("__ida").as(idCol), col("knn_rank"),
        col("__idb").as("neighbor_id"), col("cos_sim"))
  }
}
