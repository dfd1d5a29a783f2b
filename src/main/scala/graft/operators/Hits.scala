package graft.operators

import graft.functions.IntOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg 1999) in exact integer
  * arithmetic — the second classic link-analysis score next to
  * [[PageRank]]: an AUTHORITY is pointed at by good hubs, a HUB points
  * at good authorities. On a part→supplier or page→page graph the two
  * sides answer different questions than PageRank's single stationary
  * score (a part that fans out to many strong suppliers is a hub even
  * if nothing points at it).
  *
  * Determinism: classic HITS normalizes by an L2 norm — a float sqrt
  * that neither replays across engines nor survives reorderings. Here
  * each half-round renormalizes by the MAXIMUM instead:
  *
  *   a_k(v) = ⌊Σ_{u→v} h_{k-1}(u) · scale / max_w Σ h_{k-1}⌋
  *   h_k(u) = ⌊Σ_{u→v} a_k(v)   · scale / max_w Σ a_k⌋
  *
  * max-normalization preserves the RANKING each round exactly (divide
  * by the same positive constant, truncation is monotone) and keeps
  * every value in [0, scale] — the fixed point is the same principal
  * direction, expressed per-unit-of-max rather than per-unit-of-norm.
  * Every step is a commutative long sum and one truncating division, so
  * R rounds unroll in the DuckDB oracle with zero tolerance (the
  * [[KMeans]] fixed-round discipline).
  *
  * Scale shape: the deduplicated edge list persists TWICE, partitioned
  * on each join key (the LabelPropagation lesson applied to a
  * two-sided iteration): rounds exchange only node-sized score frames.
  * Per round the driver collects exactly two longs (the maxima) — the
  * bounded-scalar contract. Overflow bound (ANSI throws):
  * scale² · max-degree < 2⁶³ — at the default 10⁶ scale that admits
  * degrees to ~9·10⁶; lower `scale` for denser graphs.
  */
object Hits {

  /** `rounds` full HITS rounds from the uniform start h₀ = scale;
    * returns (node, hub_q, auth_q). Multi-edges collapse (DISTINCT —
    * HITS on a multigraph double-counts a repeated link; dedup is the
    * documented rule). Nodes appear iff they touch an edge.
    */
  def hubsAuthorities(edges: DataFrame, srcCol: String, dstCol: String,
                      rounds: Int, scale: Long = 1000000L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val spark = edges.sparkSession

    def rebase(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[Row]) = {
      val rdd = df.rdd
      rdd.cache()
      (spark.createDataFrame(rdd, df.schema), rdd)
    }

    val e0 = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
      .filter(col("s").isNotNull && col("d").isNotNull)
      .distinct()
    val eByS = e0.repartition(col("s"))
    eByS.persist()
    val eByD = eByS.repartition(col("d"))
    eByD.persist()

    val (nodes, nodesRdd) = rebase(
      eByS.select(col("s").as("node"))
        .union(eByS.select(col("d").as("node"))).distinct())

    def normalized(raw: DataFrame, keyCol: String, valCol: String,
                   outCol: String): DataFrame = {
      val mx = raw.agg(max(col(valCol))).head() match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
      val scaled =
        if (mx <= 0) lit(0L)
        else IntOps.intDiv(coalesce(col(valCol), lit(0L)) * scale, lit(mx))
      nodes.join(raw.withColumnRenamed(keyCol, "node"), Seq("node"), "left")
        .select(col("node"), scaled.as(outCol))
    }

    var (h, hRdd) = rebase(nodes.select(col("node"), lit(scale).as("h")))
    var a: DataFrame = null
    var aRdd: org.apache.spark.rdd.RDD[Row] = null
    var r = 0
    while (r < rounds) {
      val araw = eByS
        .join(h.select(col("node").as("s"), col("h")), "s")
        .groupBy(col("d")).agg(sum(col("h")).as("ar"))
      val (a2, aR2) = rebase(normalized(araw, "d", "ar", "a"))
      a2.count()
      if (aRdd != null) aRdd.unpersist(blocking = false)
      a = a2; aRdd = aR2
      val hraw = eByD
        .join(a.select(col("node").as("d"), col("a")), "d")
        .groupBy(col("s")).agg(sum(col("a")).as("hr"))
      val (h2, hR2) = rebase(normalized(hraw, "s", "hr", "h"))
      h2.count()
      hRdd.unpersist(blocking = false)
      h = h2; hRdd = hR2
      r += 1
    }
    nodesRdd.unpersist(blocking = false)
    h.join(a, Seq("node"))
      .select(col("node"), col("h").as("hub_q"), col("a").as("auth_q"))
  }
}
