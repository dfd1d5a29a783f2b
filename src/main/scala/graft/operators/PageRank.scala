package graft.operators

import graft.functions.IntOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** PageRank (Brin & Page 1998) in FIXED-POINT integer arithmetic — link
  * analysis for corpus curation (rank-weighted sampling, seed selection,
  * spam demotion) that is bit-identical across runs, partitionings, and
  * engines. The float formulation's per-node sum depends on reduction
  * order; here ranks are longs scaled by `scale`, per-edge contributions
  * are integer divisions, and the per-node sum of LONGS is exact and
  * commutative — so a DuckDB oracle can replay every iteration to the
  * last bit (no tolerance, no rounding).
  *
  *   r'(v) = (scale·(den−num))/den/N  +  (num · Σ_{u→v} r(u)/outdeg(u))/den
  *
  * with all divisions integer (`IntOps.intDiv`; inputs are non-negative
  * so floor = truncate in both engines). Truncation loses ≤ 1 unit per
  * division — at scale 10^12 that is relative error ~10^-12 per term,
  * far below the damping fixpoint's own convergence tolerance, and —
  * the point — IDENTICALLY in both engines.
  *
  * Scale shape: out-degrees and the node list are computed once; each of
  * the fixed `iterations` rounds is one join on `src` plus one
  * map-side-combined sum on `dst` — the classic distributed PageRank
  * step. Each round rebases the rank frame onto a fresh cached-RDD leaf
  * (the Closure pattern: carrying the join loop's lineage squares plan
  * statistics until planning hangs). Dangling nodes (no out-edges)
  * leak their damped mass rather than redistributing it — deterministic
  * and documented; feed a symmetrized edge list if total mass must be
  * conserved. Caller releases storage after its action
  * ([[graft.Storage.releaseAll]]).
  */
object PageRank {

  /** @param edges two-column frame (`src`, `dst`) of directed edges;
    *        duplicates are collapsed
    * @return (`node`, `rank`) — fixed-point ranks after exactly
    *         `iterations` rounds from the uniform start
    */
  def ranks(edges: DataFrame, iterations: Int = 10,
            scale: Long = 1000000000000L,
            dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampNum > 0 && dampNum < dampDen, "need 0 < dampNum < dampDen")
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).distinct()
    val eRdd = e.rdd
    eRdd.cache()
    val edgeFrame = spark.createDataFrame(eRdd, e.schema)
    val deg = edgeFrame.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val withDeg = edgeFrame.join(deg, "src")
    val wdRdd = withDeg.rdd
    wdRdd.cache()
    val edgesDeg = spark.createDataFrame(wdRdd, withDeg.schema)

    val nodes0 = edgeFrame.select(col("src").as("node"))
      .union(edgeFrame.select(col("dst").as("node"))).distinct()
    val nRdd = nodes0.rdd
    nRdd.cache()
    val nodes = spark.createDataFrame(nRdd, nodes0.schema)
    val n = nRdd.count()
    if (n == 0) return nodes.withColumn("rank", lit(0L))
    val base = scale * (dampDen - dampNum) / dampDen / n

    var ranks = nodes.withColumn("rank", lit(scale / n))
    var prev: Option[org.apache.spark.rdd.RDD[Row]] = None
    var i = 0
    while (i < iterations) {
      val contribs = edgesDeg
        .join(ranks, edgesDeg("src") === ranks("node"))
        .select(col("dst"),
          IntOps.intDiv(col("rank"), col("outdeg")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      val next = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          (lit(base) + IntOps.intDiv(
            coalesce(col("in_mass"), lit(0L)) * dampNum, lit(dampDen)))
            .as("rank"))
      val rdd = next.rdd
      rdd.cache()
      rdd.count()
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(rdd)
      ranks = spark.createDataFrame(rdd, next.schema)
      i += 1
    }
    ranks
  }
}
