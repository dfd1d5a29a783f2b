package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Synchronous label propagation over an undirected graph (Raghavan et
  * al. 2007, made DETERMINISTIC): community detection for the curation
  * graph shapes [[ConnectedComponents]] is too coarse for — a near-dup /
  * citation / co-occurrence graph is usually ONE giant component, while
  * its communities (template families, topic clusters, spam rings) are
  * what a curation pass actually samples or caps by.
  *
  * Classic LPA is notoriously nondeterministic (random visit order,
  * random tie-breaks). This variant replays bit-identically on any
  * engine: all nodes update SIMULTANEOUSLY each round (synchronous), a
  * node's new label is the most frequent label among its NEIGHBORS from
  * the previous round, and ties break to the SMALLEST label — so round
  * state is a pure function of (graph, round count), and the DuckDB
  * oracle unrolls the same R rounds as plain CTEs (q163). A fixed round
  * budget rather than fixpoint detection: synchronous LPA can 2-cycle on
  * bipartite-ish regions by design, so "fixed R" IS the deterministic
  * semantics, the [[KCore.peel]] oracle-form discipline.
  *
  * Scale shape: the symmetric edge list persists HASH-PARTITIONED on
  * the vote key, so R rounds pay ONE edge exchange total — each round
  * joins the cached partitioning against the node-sized label frame
  * (only the label frame exchanges), then a map-side-combined
  * (node, label) count and a struct-min argmax — no driver-side graph
  * state at any point. Labels rebase onto a cached
  * RDD leaf per round (plan size O(1) in rounds) and each superseded
  * leaf is released once its successor materializes (the Closure
  * unpersist discipline). Caller releases the final leaves via
  * [[graft.Storage.releaseAll]] — the Verify/Bench contract.
  */
object LabelPropagation {

  /** `rounds` synchronous rounds from the identity labeling; returns
    * (node, label). Nodes appear iff they have at least one CANONICAL
    * edge — a self-loop or a null endpoint is not an edge here (votes
    * flow between DISTINCT non-null neighbors), so a node whose only
    * rows are self-loops is absent from the output, identically on both
    * scale paths (LabelPropagationSpec pins the self-loop fixture).
    * Labels are the node-id domain, so `label` doubles as a stable
    * community representative.
    */
  def propagate(edges: DataFrame, srcCol: String, dstCol: String,
                rounds: Int): DataFrame =
    propagateCore(edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"),
      lit(1L).as("__w")), rounds)

  /** Persist a labeling as a managed table — the [[PageRank.saveRanks]]
    * serving discipline applied to community labels: compute once,
    * snapshot, and later sessions either read the table directly (the
    * q169 curation-cap consumer) or [[resumePropagate]] from it.
    */
  def saveLabels(spark: org.apache.spark.sql.SparkSession,
                 labels: DataFrame, table: String): Unit = {
    graft.sources.Sinks.dropTableAndStaleLocation(spark, table)
    labels.select(col("node"), col("label"))
      .write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** RESUME the synchronous propagation from a prior snapshot: run
    * `rounds` MORE rounds with each node starting at its snapshot label.
    * A node the snapshot never saw — and a node whose snapshot label no
    * longer names a node of the CURRENT graph (its representative left)
    * — starts at its own id, the cold value; both rules apply
    * identically on the driver and distributed paths. The round is a
    * pure function of (graph, label vector), so on an unchanged graph
    * resume(snapshot of round R, k) ≡ a cold run of R+k rounds
    * BIT-IDENTICALLY — the q198 gate (q163's oracle, verbatim
    * arithmetic). On a grown graph it is the warm-start refresh shape.
    */
  def resumePropagate(edges: DataFrame, srcCol: String, dstCol: String,
                      prior: DataFrame, rounds: Int): DataFrame =
    propagateCore(edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"),
      lit(1L).as("__w")), rounds,
      initLabels = Some(prior.select(col("node"), col("label"))))

  /** WEIGHTED [[propagate]]: each neighbor's vote counts `weightCol`
    * (an exact integer — a near-dup similarity as a float weight would
    * reintroduce order-sensitive float sums; quantize upstream, e.g.
    * the number of matching MinHash functions). Duplicate edges keep
    * their MAXIMUM weight (a deterministic dedup rule); winner stays
    * (weight-sum desc, label asc).
    */
  def propagateWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                        weightCol: String, rounds: Int): DataFrame =
    propagateCore(edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"),
      col(weightCol).cast("long").as("__w")), rounds)

  /** The canonical symmetric edge list (dedup to max weight, both
    * directions), persisted HASH-PARTITIONED ON `v` — the per-round
    * vote join keys on v, so R rounds pay this ONE edge exchange and
    * each round exchanges only the node-sized label frame (the cached
    * partitioning satisfies the join's distribution requirement;
    * LabelPropagationSpec pins the round plan). Columns: (u, v, w).
    */
  private[operators] def symPartitioned(edges: DataFrame): DataFrame = {
    val canon = edges.select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"), col("__w"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(max(col("__w")).as("w"))
    val sym = canon.select(col("a").as("u"), col("b").as("v"), col("w"))
      .union(canon.select(col("b").as("u"), col("a").as("v"), col("w")))
      .repartition(col("v"))
    sym.persist()
    sym
  }

  /** One synchronous round: each neighbor votes its previous-round
    * label with its edge weight; winner = (weight-sum desc, label asc)
    * via one lexicographic struct-min. Returns the next (node, label).
    */
  private[operators] def voteRound(sym: DataFrame, labels: DataFrame): DataFrame =
    sym
      .join(labels.select(col("node").as("v"), col("label")), "v")
      .groupBy(col("u"), col("label"))
      .agg(sum(col("w")).as("c"))
      .groupBy(col("u"))
      .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("w"))
      .select(col("u").as("node"), col("w.l").as("label"))

  private def propagateCore(edges: DataFrame, rounds: Int,
                            initLabels: Option[DataFrame] = None): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = edges.sparkSession

    def rebase(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[Row]) = {
      val rdd = df.rdd
      rdd.cache()
      (spark.createDataFrame(rdd, df.schema), rdd)
    }

    // Common case: long-keyed graph that fits the node-sized driver
    // budget → the PageRank dictionary-CSR loop (one map-only job per
    // round, no per-round shuffle at all). Other key types or bigger
    // graphs take the distributed loop below — spec-pinned
    // bit-identical.
    if (edges.schema("__s").dataType ==
        org.apache.spark.sql.types.LongType &&
        edges.schema("__d").dataType ==
        org.apache.spark.sql.types.LongType) {
      // Node inventory from the CANONICAL edge list (self-loops and null
      // endpoints dropped), the exact set the distributed path seeds its
      // labels from (sym.u) — raw endpoints would emit self-loop-only
      // nodes here but not there, breaking the bit-identity contract
      // when a graph grows past broadcastMaxNodes.
      val canon0 = edges.select(least(col("__s"), col("__d")).as("a"),
          greatest(col("__s"), col("__d")).as("b"))
        .filter(col("a") =!= col("b"))
      val nodes = canon0.select(col("a").as("n"))
        .union(canon0.select(col("b").as("n")))
        .distinct().persist()
      val n = nodes.count()
      val fits = n > 0 && n <= math.min(broadcastMaxNodes, Int.MaxValue - 8L)
      if (fits) {
        // the snapshot is node-sized — within the driver path's contract
        val init = initLabels.map(_.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap)
        val out = propagateDriver(spark, edges, nodes, n.toInt, rounds, init)
        nodes.unpersist(blocking = false)
        return out
      }
      nodes.unpersist(blocking = false)
    }

    val sym = symPartitioned(edges)

    val nodesD = sym.select(col("u").as("node")).distinct()
    val startLabels = initLabels match {
      case None => nodesD.select(col("node"), col("node").as("label"))
      case Some(p) =>
        // snapshot label, validated against the CURRENT node inventory:
        // unseen node OR dangling label (its representative left the
        // graph) → own id, matching the driver path's fallback exactly
        nodesD
          .join(p.select(col("node"), col("label").as("__pl")),
            Seq("node"), "left")
          .join(nodesD.select(col("node").as("__vn")),
            col("__pl") === col("__vn"), "left")
          .select(col("node"),
            when(col("__vn").isNotNull, col("__pl")).otherwise(col("node"))
              .as("label"))
    }
    var (labels, labelsRdd) = rebase(startLabels)

    var r = 0
    while (r < rounds) {
      val (l2, r2) = rebase(voteRound(sym, labels))
      l2.count() // materializes r2 — the previous leaf is now lineage-only
      labelsRdd.unpersist(blocking = false)
      labels = l2; labelsRdd = r2
      r += 1
    }
    labels
  }

  /** The graph-size bound for the driver-state path (the PageRank
    * contract: node-sized arrays on the driver, nothing data-sized).
    */
  private val broadcastMaxNodes = 2000000L

  /** Shared-build handle for the q198 snapshot+resume gate (the
    * Bfs/PageRank/Hits discipline): dictionary + weighted CSR built
    * once; cold and resumed propagation runs over it. Non-long-keyed or
    * oversized graphs get a fallback handle delegating each walk to the
    * one-shot entry points, unchanged.
    */
  def buildLpaGraph(edges: DataFrame, srcCol: String,
                    dstCol: String): LpaGraph = {
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"),
      lit(1L).as("__w"))
    val longKeyed = e.schema("__s").dataType ==
      org.apache.spark.sql.types.LongType &&
      e.schema("__d").dataType == org.apache.spark.sql.types.LongType
    if (!longKeyed) return new LpaGraph(spark, edges, srcCol, dstCol, None)
    val canon0 = e.select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"))
      .filter(col("a") =!= col("b"))
    val nodes = canon0.select(col("a").as("n"))
      .union(canon0.select(col("b").as("n")))
      .distinct().persist()
    val n = nodes.count()
    val fits = n > 0 && n <= math.min(broadcastMaxNodes, Int.MaxValue - 8L)
    if (!fits) {
      nodes.unpersist(blocking = false)
      return new LpaGraph(spark, edges, srcCol, dstCol, None)
    }
    val csr = buildLpaCsr(spark, e, nodes, n.toInt)
    nodes.unpersist(blocking = false)
    new LpaGraph(spark, edges, srcCol, dstCol, Some(csr))
  }

  /** See [[buildLpaGraph]]. */
  final class LpaGraph private[operators] (
      spark: org.apache.spark.sql.SparkSession, edges: DataFrame,
      srcCol: String, dstCol: String, csr: Option[LpaCsr]) {

    /** [[LabelPropagation.propagate]] over the prebuilt graph. */
    def propagate(rounds: Int): DataFrame = {
      require(rounds >= 1, s"rounds must be >= 1, got $rounds")
      csr match {
        case Some(c) => lpaLoop(spark, c, rounds, init = None)
        case None => LabelPropagation.propagate(edges, srcCol, dstCol, rounds)
      }
    }

    /** [[LabelPropagation.resumePropagate]] over the prebuilt graph. */
    def resumeFrom(prior: DataFrame, rounds: Int): DataFrame = {
      require(rounds >= 1, s"rounds must be >= 1, got $rounds")
      csr match {
        case Some(c) =>
          val m = prior.select(col("node"), col("label")).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toMap
          lpaLoop(spark, c, rounds, init = Some(m))
        case None => LabelPropagation.resumePropagate(edges, srcCol, dstCol,
          prior, rounds)
      }
    }

    /** Release the cached adjacency (driver path only; no-op otherwise). */
    def close(): Unit = csr.foreach(_.csr.unpersist(blocking = false))
  }

  /** The common-case loop: long node ids dictionary-compress to dense
    * ints (SORTED, so smaller index ⇔ smaller label — the tiebreak
    * carries over), the weighted symmetric adjacency caches as a CSR
    * RDD, and each round is ONE map-only job over it with the n-int
    * label vector broadcast — votes tally in a per-row open-address
    * pass over the neighbor array, winner = (weight desc, label asc).
    * Bit-identical to the distributed loop (LabelPropagationSpec pins
    * both paths on the same fixtures).
    */
  /** The driver path's prebuilt state: SORTED long dictionary (smaller
    * index ⇔ smaller label — the tiebreak carries over) + cached
    * weighted CSR. Built once, shared by every walk of one query.
    */
  private[operators] final case class LpaCsr(nodeVals: Array[Long],
      csr: org.apache.spark.rdd.RDD[(Int, Array[Int], Array[Long])])

  private def buildLpaCsr(spark: org.apache.spark.sql.SparkSession,
                          edges: DataFrame, nodes: DataFrame,
                          n: Int): LpaCsr = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val nodeVals: Array[Long] = nodes.collect().map(_.getLong(0)).sorted
    val idRows: java.util.List[Row] =
      nodeVals.zipWithIndex.map { case (v, i) => Row(v, i) }.toSeq.asJava
    val idSchema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("id", IntegerType, nullable = false)))
    val ids = spark.createDataFrame(idRows, idSchema)
    val ids2 = ids.select(col("node").as("node2"), col("id").as("id2"))
    val canon = edges.select(least(col("__s"), col("__d")).as("a"),
        greatest(col("__s"), col("__d")).as("b"), col("__w"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(max(col("__w")).as("w"))
    val csr: org.apache.spark.rdd.RDD[(Int, Array[Int], Array[Long])] = canon
      .join(broadcast(ids), canon("a") === ids("node"))
      .join(broadcast(ids2), canon("b") === ids2("node2"))
      .select(col("id").as("ai"), col("id2").as("bi"), col("w"))
      .select(explode(array(
        struct(col("ai").as("u"), col("bi").as("v"), col("w")),
        struct(col("bi").as("u"), col("ai").as("v"), col("w")))).as("e"))
      .select(col("e.u"), col("e.v"), col("e.w"))
      .repartition(col("u"))
      .groupBy(col("u"))
      .agg(collect_list(col("v")).as("vs"), collect_list(col("w")).as("ws"))
      .rdd.map(r => (r.getInt(0), r.getSeq[Int](1).toArray,
        r.getSeq[Long](2).toArray))
    csr.cache()
    csr.count()
    LpaCsr(nodeVals, csr)
  }

  private def propagateDriver(spark: org.apache.spark.sql.SparkSession,
                              edges: DataFrame, nodes: DataFrame, n: Int,
                              rounds: Int,
                              init: Option[scala.collection.Map[Long, Long]] = None): DataFrame = {
    val c = buildLpaCsr(spark, edges, nodes, n)
    try lpaLoop(spark, c, rounds, init)
    finally c.csr.unpersist(blocking = false)
  }

  private def lpaLoop(spark: org.apache.spark.sql.SparkSession, c: LpaCsr,
                      rounds: Int,
                      init: Option[scala.collection.Map[Long, Long]]): DataFrame = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val LpaCsr(nodeVals, csr) = c
    val n = nodeVals.length

    // warm start: snapshot labels dictionary-compress to indexes; an
    // unseen node or a dangling label (no longer in the inventory —
    // binarySearch < 0) falls back to the node's own id, the cold value
    var labels = init match {
      case None => Array.tabulate(n)(identity)
      case Some(m) => Array.tabulate(n) { j =>
        m.get(nodeVals(j)) match {
          case Some(l) =>
            val idx = java.util.Arrays.binarySearch(nodeVals, l)
            if (idx >= 0) idx else j
          case None => j
        }
      }
    }
    var r = 0
    while (r < rounds) {
      val bc = spark.sparkContext.broadcast(labels)
      val next = csr.map { case (u, vs, ws) =>
        val lv = bc.value
        // per-node vote tally over the (small) neighbor list
        val labs = new Array[Int](vs.length)
        val sums = new Array[Long](vs.length)
        var k = 0
        var j = 0
        while (j < vs.length) {
          val l = lv(vs(j))
          var f = 0
          var found = -1
          while (f < k && found < 0) { if (labs(f) == l) found = f; f += 1 }
          // addExact: the distributed path's long sum throws under ANSI
          // on overflow — the driver loop must fail loudly too, never
          // wrap silently (the weighted-vote overflow asymmetry)
          if (found >= 0) sums(found) = Math.addExact(sums(found), ws(j))
          else { labs(k) = l; sums(k) = ws(j); k += 1 }
          j += 1
        }
        var best = 0
        var f = 1
        while (f < k) {
          if (sums(f) > sums(best) ||
              (sums(f) == sums(best) && labs(f) < labs(best))) best = f
          f += 1
        }
        (u, labs(best))
      }.collect()
      bc.destroy()
      val arr = labels.clone()
      next.foreach { case (u, l) => arr(u) = l }
      labels = arr
      r += 1
    }
    // csr stays cached — its lifetime belongs to the caller (the handle
    // may run a second walk over it)
    val outSchema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("label", LongType, nullable = false)))
    val outRows: java.util.List[Row] =
      Array.tabulate(n)(i => Row(nodeVals(i), nodeVals(labels(i)))).toSeq.asJava
    spark.createDataFrame(outRows, outSchema)
  }

  /** Community roll-up: one row per surviving label with its member
    * count — the cap/sample planning view (which template families are
    * big enough to need a per-community cap).
    */
  def communitySizes(edges: DataFrame, srcCol: String, dstCol: String,
                     rounds: Int): DataFrame =
    propagate(edges, srcCol, dstCol, rounds)
      .groupBy(col("label")).agg(count(lit(1)).as("n_members"))
}
