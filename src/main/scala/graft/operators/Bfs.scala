package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Multi-source BFS hop distances — the shortest-path primitive the
  * graph family lacked (CC answers "same component?", PageRank "how
  * central?", but neither "how FAR?"): the minimum hop count from any
  * seed to each reachable node, capped at a fixed round count. The cap
  * is the determinism discipline every iterative gate here uses
  * (PageRank's fixed rounds): dist after R rounds is EXACTLY
  * min(R-hop-bounded distance), a pure function of (graph, seeds, R)
  * that the SQL oracle unrolls round by round.
  *
  * Scale shape mirrors the PageRank dual: a dictionary-CSR driver loop
  * when the node count fits `broadcastMaxNodes` (one map-only job per
  * round over the cached in-adjacency, node-sized driver state), else a
  * distributed loop that min-merges the reached frame against the
  * cached edge list (rebased per round via RDD cache — the
  * materializeLeaf discipline — so plans never nest). Unreached nodes
  * are EXCLUDED from the output, not carried as sentinels.
  *
  * Citation: frontier-relaxation BFS is the textbook form (Cormen et
  * al.); the per-round full min-merge (rather than a delta frontier) is
  * chosen deliberately so both execution paths and the oracle compute
  * the identical recurrence d_{k+1}(v) = min(d_k(v), 1 + min over
  * in-edges of d_k(src)).
  */
object Bfs {

  /** @param edges    (srcCol, dstCol) directed edges; duplicates collapse.
    *                 Symmetrize upstream for undirected distance.
    * @param seeds    one-column frame of source nodes; nodes absent from
    *                 the graph are ignored (distance only to graph nodes)
    * @param rounds   hop cap R — output distances are in [0, R]
    * @return (node, dist) for every node reachable within R hops
    */
  def hopDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, rounds: Int,
                   broadcastMaxNodes: Long = 2000000L): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val nodes0 = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes0.count()
    if (n == 0) {
      val out = nodes0.withColumn("dist", lit(0L)).limit(0)
      nodes0.unpersist(blocking = false)
      return out
    }
    val seedVals: Set[Any] = seeds
      .select(col(seeds.columns.head).as("node")).distinct()
      .collect().map(_.get(0)).toSet
    require(seedVals.nonEmpty, "seeds must be non-empty")
    if (n <= math.min(broadcastMaxNodes, Int.MaxValue - 8L))
      driverState(spark, e, nodes0, n.toInt, seedVals, rounds)
    else
      distributedState(spark, e, nodes0, seedVals, rounds)
  }

  private def driverState(spark: SparkSession, e: DataFrame,
                          nodes0: DataFrame, n: Int, seedVals: Set[Any],
                          rounds: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val nodeVals: Array[Any] = nodes0.collect().map(_.get(0))
    nodes0.unpersist(blocking = false)
    val nodeType = nodes0.schema.fields(0).dataType
    val idRows: java.util.List[org.apache.spark.sql.Row] =
      nodeVals.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(v, i) }.toSeq.asJava
    val idSchema = StructType(Seq(
      StructField("node", nodeType, nullable = true),
      StructField("id", org.apache.spark.sql.types.IntegerType, nullable = false)))
    val srcIds = spark.createDataFrame(idRows, idSchema)
    val dstIds = srcIds.select(col("node").as("node2"), col("id").as("id2"))
    val adj: org.apache.spark.rdd.RDD[(Int, Array[Int])] =
      PageRank.adjacencyPlan(e, srcIds, dstIds)
        .rdd.map(r => (r.getInt(0), r.getSeq[Int](1).toArray))
    adj.cache()
    adj.count()

    val INF = Long.MaxValue
    var dist = Array.tabulate(n)(j => if (seedVals.contains(nodeVals(j))) 0L else INF)
    var r = 0
    while (r < rounds) {
      val bc = spark.sparkContext.broadcast(dist)
      // one map-only job: per destination, the best in-neighbor distance
      // this round (INF-guarded — never INF+1)
      val mins = adj.map { case (did, sids) =>
        val dv = bc.value
        var best = INF
        var j = 0
        while (j < sids.length) {
          val d = dv(sids(j))
          if (d != INF && d + 1 < best) best = d + 1
          j += 1
        }
        (did, best)
      }.filter(_._2 != Long.MaxValue).collect()
      bc.destroy()
      val next = dist.clone()
      mins.foreach { case (did, d) => if (d < next(did)) next(did) = d }
      dist = next
      r += 1
    }
    adj.unpersist(blocking = false)
    val outRows: java.util.List[org.apache.spark.sql.Row] =
      (0 until n).iterator.filter(dist(_) != INF)
        .map(i => org.apache.spark.sql.Row(nodeVals(i), dist(i)))
        .toSeq.asJava
    spark.createDataFrame(outRows, StructType(Seq(
      StructField("node", nodeType, nullable = true),
      StructField("dist", LongType, nullable = false))))
  }

  private def distributedState(spark: SparkSession, e: DataFrame,
                               nodes0: DataFrame, seedVals: Set[Any],
                               rounds: Int): DataFrame = {
    nodes0.unpersist(blocking = false)
    val eCached = e.persist()
    eCached.count()
    // reached frame: (node, dist) for nodes with a known <= k-hop distance
    var d0 = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .filter(col("node").isInCollection(seedVals.toSeq))
      .withColumn("dist", lit(0L))
    var dRdd = d0.rdd
    dRdd.cache(); dRdd.count()
    var reached = spark.createDataFrame(dRdd, d0.schema)
    var r = 0
    while (r < rounds) {
      val stepped = eCached.join(reached, eCached("src") === reached("node"))
        .groupBy(eCached("dst").as("node")).agg((min(col("dist")) + 1L).as("dist"))
      val merged = reached.unionByName(stepped)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      // rebase each round on a cached RDD leaf (materializeLeaf
      // discipline): self-referential plans otherwise nest R deep
      val rdd = merged.rdd
      rdd.cache(); rdd.count()
      dRdd.unpersist(blocking = false)
      dRdd = rdd
      reached = spark.createDataFrame(rdd, merged.schema)
      r += 1
    }
    eCached.unpersist(blocking = false)
    reached.select(col("node"), col("dist"))
  }
}
