package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Greedy k-center (Gonzalez 1985) coreset selection over an embedding
  * column — the diversity-sampling primitive: pick m points so that every
  * corpus point is near SOME pick (2-approximation of the optimal
  * cover radius). Training-data curation uses exactly this shape to spend
  * a small annotation/inspection budget across the corpus's modes instead
  * of resampling its head.
  *
  * Determinism contract (the fixed-point discipline of [[KMeans]]):
  * coordinates are scaled longs (floor(x·scale)), distances are EXACT
  * long squared-L2 sums (embedding values are sub-unit, so a 64-dim
  * squared sum is ≤ ~9.2e13 ≪ Long.MaxValue — proven once here, not
  * per row), the first center is the lowest id, and every later round
  * picks argmax of the min-distance-to-selected with a lowest-id
  * tiebreak. The DuckDB oracle unrolls the identical m−1 rounds, so the
  * selection replays bit-exactly — no tolerance.
  *
  * Plan shape: the scaled corpus is cached once; each round is ONE
  * map-side distance update (least(prev, dist-to-new-center), the new
  * center rides the plan as an array literal — O(d), not O(corpus))
  * followed by ONE argmax aggregate collecting a SINGLE row. Driver
  * traffic is m rows total; no per-point state ever leaves the
  * executors. m is a budget knob (tens–thousands), so the m·scan cost
  * is the honest lower bound for exact greedy k-center.
  */
object KCenter {

  /** Select `m` centers greedily; returns one row per selection round.
    *
    * @return (sel_round 1..m, idCol, min_dist_sq) — min_dist_sq is the
    *         point's exact squared distance to the previously selected
    *         set AT SELECTION TIME (null for round 1: nothing is
    *         selected yet). When the corpus has fewer than m distinct
    *         vectors the selection stops early at the distinct count —
    *         a round whose argmax distance is 0 would only re-pick an
    *         already-covered point (never a duplicate-center row).
    */
  def greedy(points: DataFrame, idCol: String, vecCol: String,
             m: Int, scale: Long = 1000000L): DataFrame = {
    require(m >= 1, "m must be >= 1")
    val spark = points.sparkSession
    import spark.implicits._

    val scaled = points.select(
      col(idCol).as("__id"),
      transform(col(vecCol), x =>
        floor(x.cast("double") * lit(scale.toDouble)).cast("long")).as("__x"))
    scaled.persist()

    def distTo(center: Array[Long]): Column =
      aggregate(
        zip_with(col("__x"), typedLit(center.toSeq), (a, b) => {
          val d = a - b
          d * d
        }),
        lit(0L), (acc, x) => acc + x)

    // Round 1: the lowest id, min_dist undefined (null).
    val first = scaled.orderBy(col("__id")).limit(1)
      .select(col("__id"), col("__x")).collect()(0)
    var picks = List[(Int, Any, Option[Long])]((1, first.get(0), None))
    var lastCenter = first.getSeq[Long](1).toArray

    // Rounds 2..m: fold the new center into the running min-distance
    // (withColumn self-replace keeps ONE __d column), then argmax
    // (dist DESC, id ASC). Each round's frame persists and the previous
    // round's cache is released only AFTER the argmax has materialized
    // the new one, so no round ever recomputes the least() chain from
    // scratch — total work is O(m·d) per point, the exact-greedy lower
    // bound. Selected points carry dist 0; when the argmax itself is 0
    // every remaining point coincides with a selected center (fewer
    // than m distinct vectors), so the loop STOPS EARLY rather than
    // emit duplicate centers — the result then has one row per
    // distinct vector, not m.
    var cur = scaled.withColumn("__d", distTo(lastCenter)).persist()
    var prev: DataFrame = null
    var r = 2
    var exhausted = false
    while (r <= m && !exhausted) {
      val pick = cur.orderBy(col("__d").desc, col("__id").asc).limit(1)
        .select(col("__id"), col("__x"), col("__d")).collect()(0)
      if (prev != null) { prev.unpersist(); prev = null }
      if (pick.getLong(2) == 0L) exhausted = true
      else {
        picks ::= ((r, pick.get(0), Some(pick.getLong(2))))
        lastCenter = pick.getSeq[Long](1).toArray
        if (r < m) {
          prev = cur
          cur = cur.withColumn("__d",
            least(col("__d"), distTo(lastCenter))).persist()
        }
        r += 1
      }
    }
    if (prev != null) prev.unpersist()
    cur.unpersist()
    scaled.unpersist()

    val rows = picks.reverse.map { case (rd, id, d) =>
      Row(rd.toLong, id, d.map(Long.box).orNull)
    }
    mkResult(spark, points, idCol, rows)
  }

  private def mkResult(spark: org.apache.spark.sql.SparkSession,
                       points: DataFrame, idCol: String,
                       rows: Seq[Row]): DataFrame = {
    val idField = points.select(col(idCol)).schema.fields(0)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sel_round",
          org.apache.spark.sql.types.LongType, nullable = false),
        idField.copy(name = idCol),
        org.apache.spark.sql.types.StructField("min_dist_sq",
          org.apache.spark.sql.types.LongType, nullable = true))))
  }

  /** Assign every point to its nearest selected center — the SERVE side
    * of [[greedy]]: the coverage artifact ("which mode does this
    * document belong to; how far is it from its mode") that budgeted
    * inspection and per-mode quota sampling read. Same determinism
    * contract: exact scaled-long squared distances, argmin with a
    * lowest-center-id tiebreak (ONE lexicographic struct `least`, so the
    * comparison is a single codegen'd expression per row — no join, no
    * shuffle: the centers ride the plan as m literal vectors, m is the
    * selection budget).
    *
    * @param centers frame carrying the selected ids in `centerIdCol`
    *                (e.g. [[greedy]]'s output); vectors are looked up in
    *                `points`, so centers absent from `points` are
    *                ignored
    * @return (idCol, center_id, dist_sq) for every point
    */
  def assign(points: DataFrame, idCol: String, vecCol: String,
             centers: DataFrame, centerIdCol: String,
             scale: Long = 1000000L): DataFrame = {
    val scaled = points.select(
      col(idCol).as("__id"),
      transform(col(vecCol), x =>
        floor(x.cast("double") * lit(scale.toDouble)).cast("long")).as("__x"))
    val cs = scaled
      .join(broadcast(centers.select(col(centerIdCol).as("__cid")).distinct()),
        col("__id") === col("__cid"))
      .select(col("__id"), col("__x")).collect()
      .map(r => (r.get(0), r.getSeq[Long](1).toArray))
    require(cs.nonEmpty, "centers must intersect points")
    def distTo(center: Array[Long]): Column =
      aggregate(
        zip_with(col("__x"), typedLit(center.toSeq), (a, b) => {
          val d = a - b
          d * d
        }),
        lit(0L), (acc, x) => acc + x)
    val structs = cs.map { case (cid, cx) =>
      struct(distTo(cx).as("d"), lit(cid).as("cid")) }
    val best = if (structs.length == 1) structs.head else least(structs: _*)
    scaled.withColumn("__best", best)
      .select(col("__id").as(idCol),
        col("__best.cid").as("center_id"),
        col("__best.d").as("dist_sq"))
  }
}
