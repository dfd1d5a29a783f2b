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

  /** Reciprocal (mutual) k-NN pairs — the high-precision near-dup
    * filter over [[clusterLocalKnn]]'s graph: keep (u, v) only when
    * each is in the OTHER's top-k. One-directional neighborhood is
    * cheap to satisfy in a dense region (everything's top-k points at
    * the hub); mutuality is the standard symmetrization that cuts hub
    * noise before clustering. One self-join of the (already linear-
    * sized) graph on swapped keys — no new pair space.
    *
    * @return (id_a, id_b, cos_sim) with id_a < id_b, one row per
    *         mutual pair
    */
  def mutualPairs(graph: DataFrame, idCol: String): DataFrame = {
    val a = graph.select(col(idCol).as("id_a"),
      col("neighbor_id").as("id_b"), col("cos_sim"))
    val b = graph.select(col(idCol).as("__bv"), col("neighbor_id").as("__bn"))
    a.join(b, col("id_a") === col("__bn") && col("id_b") === col("__bv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Greedy graph-descent search over a k-NN graph — the SERVE side of
    * [[clusterLocalKnn]] (the navigable-graph ANN family's core move,
    * HNSW's layer-0 walk): from a fixed entry point, repeatedly hop to
    * whichever of {current node} ∪ {its graph neighbors} is most cosine-
    * similar to the query, for a fixed hop budget. Including the current
    * node makes the walk monotone (similarity never decreases) and a
    * converged walk stays put, so a fixed budget past convergence is
    * deterministic — the unrolled-hop oracle discipline.
    *
    * Plan shape per hop: the query-state frame (one row per query —
    * budget-bounded) joins the graph on the current node and the corpus
    * on the candidates, then one argmax per query (round-6 cosine,
    * candidate-id tiebreak). Per-hop candidate volume is queries·(k+1);
    * the graph and corpus are only ever probed by key — no scan grows
    * with the walk. Driver traffic is one queries-sized row set per hop
    * (the trajectory — the result itself).
    *
    * @param graph  (idCol, neighbor_id) rows — [[clusterLocalKnn]]'s
    *               output (or any navigable edge list), typically read
    *               back from a persisted table
    * @return (query_id, hop 0..hops, idCol, sim) — the full walk
    *         trajectory; hop 0 is the entry point (lowest corpus id)
    */
  def greedySearch(graph: DataFrame, corpus: DataFrame,
                   idCol: String, vecCol: String,
                   queries: DataFrame, qidCol: String, qvecCol: String,
                   hops: Int): DataFrame = {
    require(hops >= 0, "hops must be >= 0")
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("__cid"), col(vecCol).as("__cv"),
      VectorFunctions.normSq(col(vecCol)).as("__cn"))
    val q = queries.select(col(qidCol).as("__qid"), col(qvecCol).as("__qv"),
      VectorFunctions.normSq(col(qvecCol)).as("__qn"))
    val g = graph.select(col(idCol).as("__gsrc"),
      col("neighbor_id").as("__gdst"))
    val entry = corpus.select(col(idCol)).orderBy(col(idCol)).limit(1)
      .collect()(0).get(0)

    val simCol = round(VectorFunctions.cosineFromNormSq(
      VectorFunctions.dot(col("__qv"), col("__cv")),
      col("__qn"), col("__cn")), 6)
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__qid")).orderBy(col("sim").desc, col("__cid").asc)

    val qidField = queries.select(col(qidCol)).schema.fields(0)
    val cidField = corpus.select(col(idCol)).schema.fields(0)
    def stateDf(rows: Seq[org.apache.spark.sql.Row]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map(r => org.apache.spark.sql.Row(r.get(0), r.get(1))), 1),
        org.apache.spark.sql.types.StructType(Seq(
          qidField.copy(name = "__sq"), cidField.copy(name = "__sc"))))

    // hop 0: every query sits at the entry point
    var state: Array[org.apache.spark.sql.Row] = q
      .join(c.filter(col("__cid") === lit(entry)))
      .withColumn("sim", simCol)
      .select(col("__qid"), col("__cid"), col("sim")).collect()
    var trajectory = state.map(r => (0, r)).toVector

    var h = 1
    while (h <= hops) {
      val sel = stateDf(state.toSeq)
      val neighbors = sel.join(g, col("__sc") === col("__gsrc"))
        .select(col("__sq"), col("__gdst").as("__cand"))
      val cands = neighbors
        .unionByName(sel.select(col("__sq"), col("__sc").as("__cand")))
        .distinct()
      state = cands
        .join(c, col("__cand") === col("__cid"))
        .join(broadcast(q), col("__sq") === col("__qid"))
        .withColumn("sim", simCol)
        .withColumn("__rn", row_number().over(wPick))
        .filter(col("__rn") === 1)
        .select(col("__qid"), col("__cid"), col("sim")).collect()
      trajectory = trajectory ++ state.map(r => (h, r))
      h += 1
    }

    spark.createDataFrame(
      spark.sparkContext.parallelize(
        trajectory.map { case (hop, r) =>
          org.apache.spark.sql.Row(r.get(0), hop.toLong, r.get(1), r.get(2))
        }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        qidField.copy(name = "query_id"),
        org.apache.spark.sql.types.StructField("hop",
          org.apache.spark.sql.types.LongType, nullable = false),
        cidField.copy(name = idCol),
        org.apache.spark.sql.types.StructField("sim",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
  }
}
