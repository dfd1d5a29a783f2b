package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

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

  /** Deterministic random-walk corpus over the k-NN graph — the DeepWalk
    * / node2vec data-generation step (Perozzi et al. 2014) re-expressed
    * reproducibly: from every graph node, a `steps`-hop walk whose next
    * edge is chosen by a SEEDED mixed-congruential draw over the node's
    * ranked neighbor list (rank = 1 + h(node, start, step) mod degree),
    * so the walk table is a pure function of the graph — replayable by
    * any engine, shardable without coordination, and the oracle can
    * verify it hop for hop. True pseudo-randomness would make the
    * output untestable and non-resumable; the uniform-over-neighbors
    * law is preserved (the multiplier is the Knuth 2⁶⁴ golden-ratio
    * constant truncated to keep ANSI longs exact: node·2654435761 stays
    * < 2⁶³ for any conceivable corpus id).
    *
    * The output composes directly with
    * [[graft.ops.Sequences.skipGramPairs]] (start_id as the sequence
    * key, node_id as the token, step as the order) — walks + skip-grams
    * IS the node-embedding training-pair pipeline.
    *
    * Scale shape: `steps` equi-joins of the (linear-sized) walk frontier
    * against the graph and its degree table — never a pair space; a
    * dead-end node simply truncates its walk (inner join), identically
    * in both engines. Output is nodes·(steps+1) rows, linear.
    */
  def deterministicWalks(graph: DataFrame, idCol: String, steps: Int,
                         curMult: Long = 2654435761L,
                         startMult: Long = 69069L,
                         stepMult: Long = 40503L): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val deg = graph.groupBy(col(idCol).as("__node"))
      .agg(count(lit(1)).as("__d"))
    val g = graph.select(col(idCol).as("__src"), col("knn_rank").as("__r"),
      col("neighbor_id").as("__dst"))
    var frontier = deg.select(col("__node").as("start_id"),
      lit(0L).as("step"), col("__node").as("node_id"))
    val acc = scala.collection.mutable.ArrayBuffer(frontier)
    for (s <- 1 to steps) {
      val h = col("node_id") * lit(curMult) +
        col("start_id") * lit(startMult) + lit(s.toLong) * lit(stepMult)
      frontier = frontier
        .join(deg, frontier("node_id") === deg("__node"))
        .join(g, col("node_id") === col("__src") &&
          col("__r") === lit(1L) + h % col("__d"))
        .select(col("start_id"), lit(s.toLong).as("step"),
          col("__dst").as("node_id"))
      acc += frontier
    }
    acc.reduce(_ unionByName _)
  }

  /** The per-hop edge probe: the walk state is driver-held, so the
    * frontier's node ids ride into the graph scan as a LITERAL In
    * filter — pushed to the parquet reader, where row-group min/max
    * stats on a store sorted by the source id turn the lookup into a
    * point read (the `ivfTopKStored` discipline; spec-pinned in
    * KnnWalkPlanSpec). Exposed private[graft] as the plan-pin seam.
    */
  private[graft] def edgeProbe(g: DataFrame, srcCol: String,
                               ids: Seq[Any]): DataFrame =
    g.filter(col(srcCol).isin(ids: _*))

  /** The per-hop corpus probe: candidate ids (≤ frontier·(k+1), known
    * on the driver before scoring) prune the vector scan the same way.
    * Above `literalProbeMax` the literal list would bloat the plan, so
    * the probe falls back to the unpruned scan and the caller's join
    * does the filtering (same answers, no pushdown). Exposed
    * private[graft] as the plan-pin seam.
    */
  private[graft] def corpusProbe(c: DataFrame, idColName: String,
                                 ids: Seq[Any],
                                 literalProbeMax: Int): DataFrame =
    if (ids.size <= literalProbeMax) c.filter(col(idColName).isin(ids: _*))
    else c

  /** Shared walk core for [[greedySearch]] (beam = 1) and
    * [[beamSearch]]: per hop the driver-held state (≤ queries·beam
    * rows) yields the frontier, the frontier prunes the edge scan, the
    * collected adjacency (≤ frontier·k id pairs) yields the candidate
    * pairs, and the candidate ids prune the corpus scan before one
    * distributed rank per query. Returns (hop, qid, node, sim, rank)
    * rows plus the two id fields for schema building.
    */
  private def walkTrajectory(graph: DataFrame, corpus: DataFrame,
                             idCol: String, vecCol: String,
                             queries: DataFrame, qidCol: String,
                             qvecCol: String, hops: Int, beam: Int,
                             literalProbeMax: Int)
      : (Vector[(Int, Row)], StructField, StructField) = {
    require(hops >= 0, "hops must be >= 0")
    require(beam >= 1, "beam must be >= 1")
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
    val wPick = Window.partitionBy(col("__sq"))
      .orderBy(col("sim").desc, col("__cid").asc)

    val qidField = queries.select(col(qidCol)).schema.fields(0)
    val cidField = corpus.select(col(idCol)).schema.fields(0)
    val pairSchema = StructType(Seq(
      qidField.copy(name = "__sq"), cidField.copy(name = "__cand")))

    // one candidate-scoring pass: the (qid, cand) pairs are built on
    // the driver (already DISTINCT per query — a duplicate candidate
    // must not occupy two beam ranks), the corpus probe is pruned by
    // the literal candidate-id set, the query vectors broadcast, and
    // one window keeps the per-query top-`beam`
    def score(pairs: Seq[(Any, Any)]): Array[Row] = {
      val candIds = pairs.map(_._2).distinct
      spark.createDataFrame(
          spark.sparkContext.parallelize(
            pairs.map { case (a, b) => Row(a, b) }, 1), pairSchema)
        .join(corpusProbe(c, "__cid", candIds, literalProbeMax),
          col("__cand") === col("__cid"))
        .join(broadcast(q), col("__sq") === col("__qid"))
        .withColumn("sim", simCol)
        .withColumn("__rn", row_number().over(wPick))
        .filter(col("__rn") <= beam)
        .select(col("__sq"), col("__cid"), col("sim"),
          col("__rn").cast("long"))
        .collect()
    }

    val qids = q.select(col("__qid")).orderBy(col("__qid")).collect()
      .map(_.get(0)).toSeq
    // hop 0: every query sits at the entry point (one candidate each)
    var state: Array[Row] = score(qids.map(_ -> entry))
    var trajectory = state.map(r => (0, r)).toVector

    var h = 1
    while (h <= hops) {
      val frontier = state.map(_.get(1)).distinct.toSeq
      // adjacency for the frontier only: a literal-In pruned scan when
      // the frontier is small (always, for budget-bounded query
      // batches), a broadcast semi-join otherwise — either way the
      // driver receives ≤ frontier·k id pairs
      val adjRows: Array[Row] =
        if (frontier.size <= literalProbeMax)
          edgeProbe(g, "__gsrc", frontier).collect()
        else {
          val fDf = spark.createDataFrame(
            spark.sparkContext.parallelize(
              frontier.map(Row(_)), 1),
            StructType(Seq(cidField.copy(name = "__f"))))
          g.join(broadcast(fDf), col("__gsrc") === col("__f"))
            .select(col("__gsrc"), col("__gdst")).collect()
        }
      val adj: Map[Any, Seq[Any]] = adjRows.toSeq
        .groupBy(_.get(0)).map { case (s, rs) => s -> rs.map(_.get(1)) }
      val byQuery: Map[Any, Seq[Any]] = state.toSeq.groupBy(_.get(0))
        .map { case (qid, rs) => qid -> rs.map(_.get(1)) }
      val pairs = byQuery.toSeq.flatMap { case (qid, nodes) =>
        (nodes ++ nodes.flatMap(n => adj.getOrElse(n, Seq.empty)))
          .distinct.map(qid -> _)
      }
      state = score(pairs)
      trajectory = trajectory ++ state.map(r => (h, r))
      h += 1
    }
    (trajectory, qidField, cidField)
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
    * Plan shape per hop: the walk state is driver-held (one row per
    * query — budget-bounded), so BOTH table probes carry literal In
    * filters built from it: the frontier ids prune the edge scan and
    * the candidate ids prune the corpus scan (row-group skipping on
    * id-sorted stores — each hop is a point lookup, not a table pass).
    * Per-hop candidate volume is queries·(k+1); driver traffic is the
    * adjacency id pairs plus one queries-sized row set per hop (the
    * trajectory — the result itself).
    *
    * @param graph  (idCol, neighbor_id) rows — [[clusterLocalKnn]]'s
    *               output (or any navigable edge list), typically read
    *               back from a persisted table sorted by idCol
    * @param literalProbeMax above this many ids the probes skip the
    *               literal In filter (plan-size guard) and filtering
    *               happens in the join — same answers, no pushdown
    * @return (query_id, hop 0..hops, idCol, sim) — the full walk
    *         trajectory; hop 0 is the entry point (lowest corpus id)
    */
  def greedySearch(graph: DataFrame, corpus: DataFrame,
                   idCol: String, vecCol: String,
                   queries: DataFrame, qidCol: String, qvecCol: String,
                   hops: Int, literalProbeMax: Int = 4096): DataFrame = {
    val (trajectory, qidField, cidField) = walkTrajectory(graph, corpus,
      idCol, vecCol, queries, qidCol, qvecCol, hops, beam = 1,
      literalProbeMax = literalProbeMax)
    val spark = corpus.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        trajectory.map { case (hop, r) =>
          Row(r.get(0), hop.toLong, r.get(1), r.get(2))
        }, 1),
      StructType(Seq(
        qidField.copy(name = "query_id"),
        StructField("hop", LongType, nullable = false),
        cidField.copy(name = idCol),
        StructField("sim", DoubleType, nullable = true))))
  }

  /** Beam-width graph search (efSearch) — [[greedySearch]]'s natural
    * completion: instead of one current node, each query carries its
    * top-`beam` BEST-SEEN set; per hop the candidates are that set plus
    * all its graph neighbors (DISTINCT — a shared neighbor must not eat
    * two beam slots), re-ranked by (round-6 cosine DESC, id ASC) and
    * cut back to `beam`. The state is the top-`beam` of a superset of
    * itself every hop, so the best-seen set only improves (the greedy
    * walk's monotonicity argument, lifted to sets) and a converged set
    * stays put — the same unrolled-hop oracle discipline, with
    * row_number ≤ beam in place of = 1. Recall strictly dominates the
    * greedy walk's at equal hop budget (the set contains the greedy
    * path's best node); measured deltas live in WalkRecallProbe.
    *
    * Same per-hop plan shape and driver-traffic bounds as
    * [[greedySearch]], with frontier ≤ queries·beam.
    *
    * @return (query_id, hop 0..hops, beam_rank 1..beam, idCol, sim) —
    *         hop 0 is the entry point alone at rank 1
    */
  def beamSearch(graph: DataFrame, corpus: DataFrame,
                 idCol: String, vecCol: String,
                 queries: DataFrame, qidCol: String, qvecCol: String,
                 hops: Int, beam: Int,
                 literalProbeMax: Int = 4096): DataFrame = {
    val (trajectory, qidField, cidField) = walkTrajectory(graph, corpus,
      idCol, vecCol, queries, qidCol, qvecCol, hops, beam = beam,
      literalProbeMax = literalProbeMax)
    val spark = corpus.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        trajectory.map { case (hop, r) =>
          Row(r.get(0), hop.toLong, r.get(3), r.get(1), r.get(2))
        }, 1),
      StructType(Seq(
        qidField.copy(name = "query_id"),
        StructField("hop", LongType, nullable = false),
        StructField("beam_rank", LongType, nullable = false),
        cidField.copy(name = idCol),
        StructField("sim", DoubleType, nullable = true))))
  }
}
