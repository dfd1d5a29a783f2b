package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorFunctions

/** Density-based clustering (DBSCAN, Ester et al. 1996) over an embedding
  * corpus — the curation move the centroid families can't make: k-means
  * (q94) forces EVERY point into a cluster and only finds convex blobs;
  * DBSCAN separates the dense near-dup islands (clusters), their fringes
  * (border points), and the background (noise) — which is exactly the
  * triage a training-data pass wants ("keep one per dense island, keep
  * the background as-is").
  *
  * Exact DBSCAN needs every ε-neighborhood — all n² similarities. The
  * scale shape is the q228/q95 discipline: the ε-neighbor relation is
  * DEFINED within the point's own k-means cell (derived k keeps the pair
  * space Σ n_c² ≈ n·target, linear in the corpus), making the semantics
  * deterministic and exactly replayable rather than a heuristic cut of
  * the global graph. Within that relation the algorithm is textbook:
  *
  *   - ε-neighbors: same-cell pairs with round-6 cosine ≥ eps (the q29
  *     rounding guard); zero-norm vectors have null cosine and are
  *     neighbors of nothing (§1.4 null policy).
  *   - core: ≥ `minPts` ε-neighbors (SELF EXCLUDED — documented here
  *     because the 1996 paper counts the point itself; minPts here is
  *     "other points required in the ball").
  *   - clusters: connected components over core–core ε-edges
  *     ([[ConnectedComponents.components]] — pointer jumping to
  *     fixpoint); the label is the component's minimum core id, a core
  *     with no core neighbor labels as itself.
  *   - border: non-core with ≥ 1 core ε-neighbor; classic DBSCAN
  *     assigns border points to WHICHEVER core claimed them first (scan-
  *     order dependent — not replayable); here a border point takes the
  *     MINIMUM adjacent core's cluster label, a total deterministic rule.
  *   - noise: everything else; cluster is null.
  *
  * Plan shape: ONE cell equi-join builds the ε-pair frame (persisted —
  * it feeds the degree count, the core–core edges, and the border
  * assignment; caller releases via [[graft.Storage.releaseAll]], the
  * Verify/Bench contract), then a groupBy count, a components run over
  * the (pair-space-bounded) core subgraph, and one min-aggregate for
  * borders. No all-pairs anywhere; no window over anything wider than a
  * cell.
  *
  * Parameters for the q236 gate were probed, not guessed —
  * [[DbscanProbe]] records the (eps, minPts) sweep: eps=0.35/minPts=2 is
  * the one grid point where core, border, AND noise are all populated
  * and a 15–48-cluster structure exists at every gate SF.
  */
object Dbscan {

  /** @param points frame carrying id, vector, and cell columns (cell from
    *               [[KMeans.assignAuto]] — derived k keeps the pair space
    *               linear; see object doc)
    * @param eps    round-6 cosine similarity floor for ε-neighborhood
    * @param minPts ε-neighbors (self excluded) required for core status
    * @return one row per input point: (idCol, point_type, cluster) —
    *         point_type ∈ core/border/noise; cluster = min reachable
    *         core id for core points, min adjacent core's label for
    *         border points, null for noise
    */
  def clusterCells(points: DataFrame, idCol: String, vecCol: String,
                   cellCol: String, eps: Double, minPts: Int): DataFrame = {
    require(minPts >= 1, "minPts must be >= 1")
    // one prepared (cell, id, vec, normSq) frame persisted for its THREE
    // readers (both sides of the cell self-join and the final id spine):
    // unpersisted, each reader re-ran the caller's upstream plan — for
    // the q236 gate that is the corpus ⋈ k-means-assignment join, paid
    // 3× (caller releases via graft.Storage.releaseAll, the
    // Verify/Bench contract)
    val prepped = points.select(col(cellCol).as("__c"), col(idCol).as("__id"),
        col(vecCol).as("__v"), VectorFunctions.normSq(col(vecCol)).as("__n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = prepped.select(col("__c"), col("__id").as("__ia"),
      col("__v").as("__va"), col("__n").as("__na"))
    val b = prepped.select(col("__c"), col("__id").as("__ib"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    // ε-pair frame (both directions — a and b both range over the corpus),
    // persisted once for its three consumers
    val pairs = a.join(b, "__c")
      .filter(col("__ia") =!= col("__ib"))
      .withColumn("__cs", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("__va"), col("__vb")),
        col("__na"), col("__nb")), 6))
      .filter(col("__cs").isNotNull && col("__cs") >= eps)
      .select(col("__ia"), col("__ib"))
      // The join partitions by CELL, so in a dense regime (eps low
      // relative to the corpus's cosine tail) one giant cell's ε-pairs
      // form ONE partition — a multi-GB block no storage level survives
      // (measured: the pre-fix 10×-probe corpus flooded ε=0.35 with
      // 126M pairs and a single block OOMed both build and read-back).
      // Repartition on the high-cardinality POINT id before persisting
      // so blocks stay bounded whatever the cell skew. DISK_ONLY per
      // the q207 exploded-frame lesson.
      .repartition(col("__ia"))
      .persist(StorageLevel.DISK_ONLY)

    val core = pairs.groupBy(col("__ia")).count()
      .filter(col("count") >= minPts)
      .select(col("__ia").as("__core_id"))

    // core–core ε-edges → components; min core id labels the cluster
    val coreEdges = pairs
      .join(core.withColumnRenamed("__core_id", "__ia"), Seq("__ia"))
      .join(core.withColumnRenamed("__core_id", "__ib"), Seq("__ib"))
      .select(col("__ia").as("u"), col("__ib").as("v"))
    val comp = ConnectedComponents.components(coreEdges)
    val coreLabeled = core
      .join(comp, core("__core_id") === comp("node"), "left")
      .select(col("__core_id"),
        coalesce(col("component"), col("__core_id")).as("__cl"))

    // border: non-core adjacent to ≥1 core; min adjacent core label
    val borderLabeled = pairs
      .join(coreLabeled, pairs("__ib") === coreLabeled("__core_id"))
      .join(core.withColumnRenamed("__core_id", "__ia"), Seq("__ia"),
        "left_anti")
      .groupBy(col("__ia"))
      .agg(min(col("__cl")).as("__bl"))

    prepped.select(col("__id").as(idCol))
      .join(coreLabeled, col(idCol) === coreLabeled("__core_id"), "left")
      .join(borderLabeled, col(idCol) === borderLabeled("__ia"), "left")
      .select(col(idCol),
        when(col("__core_id").isNotNull, lit("core"))
          .when(col("__bl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("point_type"),
        when(col("__core_id").isNotNull, col("__cl"))
          .otherwise(col("__bl")).as("cluster"))
  }
}
