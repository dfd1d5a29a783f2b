package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lloyd's k-means (the SemDeDup / semantic-clustering workhorse:
  * Abbas et al. 2023 cluster embeddings before within-cluster dedup) in
  * FIXED-POINT integer arithmetic, so the clustering is bit-identical
  * across runs, partitionings, and engines — a DuckDB oracle replays
  * every Lloyd round to the last bit with no tolerance. A float k-means
  * cannot promise that: each centroid update sums doubles in
  * partition-dependent order, and one ULP of centroid drift can flip a
  * boundary point's assignment.
  *
  * Determinism ingredients:
  *   - coordinates are scaled longs: `floor(double(x) · scale)` (floor
  *     BEFORE the integral cast — DuckDB's double→int cast rounds,
  *     Spark's truncates; an integral double casts identically);
  *   - distances are exact long sums of squared differences;
  *   - ties in the nearest-centroid argmin break to the LOWEST centroid
  *     id (lexicographic struct min here, `ORDER BY dist, cid` there);
  *   - centroid updates divide exact long sums by member counts with
  *     TRUNCATING division — Spark's `div` and DuckDB's `//` both
  *     truncate toward zero (−7/2 = −3 in both), so signed coordinates
  *     replay exactly;
  *   - init is the k lowest-id points (cid = rank), not a seeded RNG;
  *   - a cluster that empties keeps its previous centroid.
  *
  * Scale shape: the classic distributed Lloyd step — centroids are
  * O(k·d) and live on the driver (collected once per round, exactly as
  * Spark MLlib's KMeans does); each round is ONE scan of the points with
  * the k distance expressions inlined as literal arrays (zero joins,
  * zero shuffles of the points) feeding a map-side-combined k-row
  * aggregate whose exchange carries ≤ k·partitions rows. The scaled
  * points are cached once on an RDD leaf; iterations do not grow
  * lineage because only the centroid LITERALS change per round. Caller
  * releases storage after its action ([[graft.Storage.releaseAll]]).
  */
object KMeans {

  /** Column API: index of the nearest centroid (exact long squared
    * distance, ties to the lowest cid) — one native k·d long loop per
    * point instead of k interpreted higher-order-function lambdas (the
    * HOF form below, kept as the parity reference, re-enters the lambda
    * interpreter per element; profiled ~5× slower at k=20, d=64).
    * The matrix rides INSIDE the expression node — plan and task
    * serialization grow O(k·d); prefer [[nearestCentroidBcast]] (what
    * [[assign]] plans) whose broadcast handle keeps the plan O(1) in k.
    */
  def nearestCentroid(vec: Column, centroids: Array[Array[Long]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NearestCentroidExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(vec),
        centroids.map(_.toSeq).toSeq))

  /** [[nearestCentroid]] reading the centroid matrix from ONE torrent
    * broadcast instead of carrying it in the expression tree: the plan,
    * its string form, and every serialized task stay O(1) in k (pinned in
    * KMeansSpec with SizeEstimator at k=24 vs k=512), and executors fetch
    * the matrix once per node through the broadcast machinery — the form
    * that keeps large derived k ([[kForTargetClusterSize]]) plannable.
    * Same arithmetic and (dist, cid) tiebreak as the literal and HOF
    * forms (spec-pinned equal).
    */
  def nearestCentroidBcast(vec: Column,
      centroids: org.apache.spark.broadcast.Broadcast[Array[Array[Long]]]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NearestCentroidBcastExpr(
        org.apache.spark.sql.GraftColumnBridge.expression(vec), centroids))

  /** The built-in formulation of [[nearestCentroid]] — the parity
    * reference (pinned equal in KMeansSpec): one literal centroid matrix
    * traversed by a transform/aggregate chain, lexicographic struct-min
    * for the (dist, cid) tiebreak.
    */
  def nearestCentroidBuiltin(vec: Column, cs: Array[Array[Long]]): Column = {
    val mat = array(cs.zipWithIndex.map { case (c, j) =>
      struct(lit(j).as("cid"), typedLit(c.toSeq).as("c"))
    }: _*)
    array_min(transform(mat, cent =>
      struct(
        aggregate(zip_with(vec, cent.getField("c"),
          (a, b) => (a - b) * (a - b)), lit(0L), (acc, v) => acc + v).as("d"),
        cent.getField("cid").as("cid")))).getField("cid")
  }

  /** Derive k from a TARGET CLUSTER SIZE — the SemDeDup discipline
    * (Abbas et al. 2023 run k ≈ corpus/10⁴ for 100M points precisely to
    * bound within-cluster work). Any within-cluster-quadratic consumer
    * ([[Dedup.semDedup]]) does Θ(Σ n_c²) ≈ n · cluster_size work, so k
    * must GROW with the corpus: k = ⌈n / targetClusterSize⌉, clamped to
    * [1, maxK]. The maxK ceiling exists because each Lloyd round carries
    * the k·d centroid matrix as one plan literal and collects k·d longs
    * to the driver — both fine into the thousands, not the millions.
    * Matches the oracle's `ceil(count(*) / target)` exactly: the IEEE
    * double quotient n/target is ≥ 1/target away from any integer it is
    * not exactly equal to, so the two ceil paths cannot disagree.
    */
  def kForTargetClusterSize(n: Long, targetClusterSize: Long,
                            maxK: Int = 4096): Int = {
    require(targetClusterSize >= 1, "targetClusterSize must be >= 1")
    require(maxK >= 1, "maxK must be >= 1")
    val k = (n + targetClusterSize - 1) / targetClusterSize
    math.max(1L, math.min(k, maxK.toLong)).toInt
  }

  /** [[assign]] with k derived from the corpus size ([[kForTargetClusterSize]]):
    * one count job, then the standard Lloyd chain. This is the entry point
    * quadratic consumers should use — it keeps their pair space linear in
    * the corpus at a fixed per-point cost.
    */
  def assignAuto(points: DataFrame, idCol: String, vecCol: String,
                 targetClusterSize: Long, iterations: Int = 5,
                 scale: Long = 1000000L, maxK: Int = 4096): DataFrame =
    assign(points, idCol, vecCol,
      k = kForTargetClusterSize(points.count(), targetClusterSize, maxK),
      iterations = iterations, scale = scale)

  /** Cluster `points` and return every point's final assignment.
    *
    * @param points frame with an id column and an array<float/double>
    *               vector column of uniform dimension
    * @param k      number of clusters (capped at the point count)
    * @param iterations Lloyd rounds (assign → re-center), all executed —
    *               no early-exit, so the oracle unrolls the same count
    * @param scale  fixed-point scale for coordinates (10^6 keeps
    *               64-dim squared distances ≪ Long.MaxValue)
    * @return (idCol, `cluster`) — cluster is the centroid index in
    *         [0, k), from the final assignment pass
    */
  def assign(points: DataFrame, idCol: String, vecCol: String,
             k: Int = 8, iterations: Int = 5,
             scale: Long = 1000000L): DataFrame =
    assignCore(points, idCol, vecCol, k, iterations, scale)._1

  /** [[assign]] plus the cached point-leaf RDD the returned frame reads,
    * so a caller that materializes a derivation of the assignment (e.g.
    * [[assignTwoLevel]]'s fine leaf) can release the cache instead of
    * letting it outlive its use (the Closure unpersist discipline).
    */
  private def assignCore(points: DataFrame, idCol: String, vecCol: String,
                         k: Int, iterations: Int, scale: Long):
      (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val (pts, centroids, rdd) = fitCore(points, idCol, vecCol, k, iterations, scale)
    val b = points.sparkSession.sparkContext.broadcast(centroids)
    (pts.select(col("__id").as(idCol),
      KMeans.nearestCentroidBcast(col("__x"), b).as("cluster")), rdd)
  }

  /** The Lloyd training core behind [[assign]], exposed for consumers
    * that need the CODEBOOK itself (product quantization trains one per
    * subspace): returns the cached scaled-long point frame
    * (`__id`, `__x`) and the final centroid matrix. Identical
    * determinism contract to [[assign]] — scaled-long coords, exact long
    * sums, truncating division, lowest-cid ties, k-lowest-id init, an
    * emptied cluster keeps its centroid — so oracles replay the returned
    * codebook exactly.
    */
  def fit(points: DataFrame, idCol: String, vecCol: String,
          k: Int, iterations: Int,
          scale: Long = 1000000L): (DataFrame, Array[Array[Long]]) = {
    val (pts, centroids, _) = fitCore(points, idCol, vecCol, k, iterations, scale)
    (pts, centroids)
  }

  private def fitCore(points: DataFrame, idCol: String, vecCol: String,
                      k: Int, iterations: Int, scale: Long):
      (DataFrame, Array[Array[Long]], org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    require(k >= 1, "k must be >= 1")
    require(iterations >= 0, "iterations must be >= 0")
    val spark = points.sparkSession
    val scaled0 = points.select(
      col(idCol).as("__id"),
      transform(col(vecCol), x =>
        floor(x.cast("double") * lit(scale.toDouble)).cast("long")).as("__x"))
    val rdd = scaled0.rdd
    rdd.cache()
    val pts = spark.createDataFrame(rdd, scaled0.schema)

    // Deterministic init: the k lowest-id points, cid = rank order.
    var centroids: Array[Array[Long]] = pts.orderBy(col("__id")).limit(k)
      .select(col("__x")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(centroids.nonEmpty, "k-means needs at least one point")
    val d = centroids(0).length

    // Native argmin against a BROADCAST centroid matrix (see
    // [[NearestCentroidBcastExpr]]): the plan carries only the broadcast
    // handle, so plan size and task serialization stay O(1) in k and
    // larger derived k (see [[kForTargetClusterSize]]) stays plannable;
    // the arithmetic and (dist, cid) tiebreak are pinned equal to the
    // literal and higher-order-function forms in KMeansSpec. Each round's
    // broadcast is destroyed after its collect; the FINAL one must
    // outlive this call (the returned frame is lazy) and is reclaimed by
    // the context cleaner when the frame is GC'd.
    def nearest(cs: Array[Array[Long]]):
        (Column, org.apache.spark.broadcast.Broadcast[Array[Array[Long]]]) = {
      val b = spark.sparkContext.broadcast(cs)
      (KMeans.nearestCentroidBcast(col("__x"), b), b)
    }

    var i = 0
    while (i < iterations) {
      val sumCols = (0 until d).map(j =>
        sum(element_at(col("__x"), j + 1)).as(s"s$j"))
      val (cidCol, b) = nearest(centroids)
      val stats = pts.withColumn("cid", cidCol)
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .collect()
        .map(r => r.getInt(0) -> r).toMap
      b.destroy()
      centroids = centroids.zipWithIndex.map { case (prev, cid) =>
        stats.get(cid) match {
          case Some(r) =>
            val n = r.getLong(1)
            Array.tabulate(d)(j => r.getLong(2 + j) / n)
          case None => prev // emptied cluster keeps its centroid
        }
      }
      i += 1
    }

    (pts, centroids, rdd)
  }

  /** TWO-LEVEL Lloyd — the scale path past flat k-means' per-point k·d
    * ceiling. Flat assignment at derived k = n/target evaluates every
    * centroid per point, so per-point cost GROWS with the corpus; the
    * hierarchical form clusters twice:
    *
    *  1. a COARSE pass with k₁ = ⌈√k⌉ clusters (flat [[assign]]), then
    *  2. a FINE pass inside each coarse cluster c with
    *     k₂(c) = ⌈n_c/target⌉ clusters — every fine round is still ONE
    *     scan (argmin against the point's own coarse block of a single
    *     broadcast map) feeding one map-side-combined (coarse, fine)
    *     aggregate.
    *
    * Per-point cost is k₁·d + k₂(c)·d ≈ 2·√k·d — at k = 512 that is
    * ~2× the flat k = 24 rate instead of ~21× (measured: see NEXT.md),
    * and it stays ~√-bounded as the corpus grows. Total centroid state
    * is still Θ(k·d) longs, but it lives in ONE broadcast (plan O(1),
    * spec-pinned) and only k rows cross the driver per round — the
    * MLlib-shaped bound, fine into the hundreds of thousands of
    * clusters.
    *
    * Every ingredient keeps the fixed-point determinism contract of
    * [[assign]] (scaled-long coords, exact long sums, truncating
    * division, lowest-cid ties, k-lowest-id init per coarse group, an
    * emptied fine cluster keeps its centroid), so the DuckDB oracle
    * replays both levels bit-exactly (q112).
    *
    * @return (idCol, `coarse`, `fine`, `cluster`) — cluster =
    *         coarse·maxK + fine, injective because fine < maxK by the
    *         per-group clamp; quadratic consumers ([[Dedup.semDedup]])
    *         group by it directly.
    */
  def assignTwoLevel(points: DataFrame, idCol: String, vecCol: String,
                     targetClusterSize: Long, iterations: Int = 5,
                     scale: Long = 1000000L, maxK: Int = 4096): DataFrame = {
    require(targetClusterSize >= 1, "targetClusterSize must be >= 1")
    require(iterations >= 0, "iterations must be >= 0")
    val spark = points.sparkSession
    val kTotal = kForTargetClusterSize(points.count(), targetClusterSize, maxK)
    // ⌈√k⌉ — IEEE sqrt is correctly rounded, so DuckDB's
    // ceil(sqrt(k)) lands on the identical integer
    val k1 = math.ceil(math.sqrt(kTotal.toDouble)).toInt
    val (coarse, coarseRdd) = assignCore(points, idCol, vecCol, k = k1,
      iterations = iterations, scale = scale)

    val scaled0 = points.select(
      col(idCol).as("__id"),
      transform(col(vecCol), x =>
        floor(x.cast("double") * lit(scale.toDouble)).cast("long")).as("__x"))
      .join(coarse.select(col(idCol).as("__id"), col("cluster").as("__g")), "__id")
    val rdd = scaled0.rdd
    rdd.cache()
    val pts = spark.createDataFrame(rdd, scaled0.schema)

    // Init: the k₂(g) lowest-id points of each coarse group, fine cid =
    // rank order within the group (the per-group analog of flat init).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__g")).orderBy(col("__id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))
    val initRows = pts
      .withColumn("__rn", row_number().over(w))
      .withColumn("__ng", count(lit(1)).over(wAll))
      .filter(col("__rn") <= least(
        ceil(col("__ng") / lit(targetClusterSize.toDouble)).cast("long"),
        lit(maxK.toLong)))
      .select(col("__g"), (col("__rn") - 1).cast("int").as("cid"), col("__x"))
      .collect()
    // the collect above materialized the fine leaf (join of points with the
    // coarse assignment) — the coarse fit's point cache is now lineage-only
    // and every later pass reads the fine leaf, so release it here instead
    // of letting it double storage until the harness sweep
    coarseRdd.unpersist(blocking = false)
    require(initRows.nonEmpty, "two-level k-means needs at least one point")
    val d = initRows.head.getSeq[Long](2).length
    var cents: Map[Int, Array[Array[Long]]] = initRows
      .groupBy(_.getInt(0))
      .map { case (g, rows) =>
        g -> rows.sortBy(_.getInt(1)).map(_.getSeq[Long](2).toArray)
      }

    def fineCol(cs: Map[Int, Array[Array[Long]]]):
        (Column, org.apache.spark.broadcast.Broadcast[Map[Int, Array[Array[Long]]]]) = {
      val b = spark.sparkContext.broadcast(cs)
      (org.apache.spark.sql.GraftColumnBridge.column(
        NearestCentroidGroupExpr(
          org.apache.spark.sql.GraftColumnBridge.expression(col("__g")),
          org.apache.spark.sql.GraftColumnBridge.expression(col("__x")), b)), b)
    }

    var i = 0
    while (i < iterations) {
      val sumCols = (0 until d).map(j =>
        sum(element_at(col("__x"), j + 1)).as(s"s$j"))
      val (cidCol, b) = fineCol(cents)
      val stats = pts.withColumn("cid", cidCol)
        .groupBy(col("__g"), col("cid"))
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
      b.destroy()
      cents = cents.map { case (g, arr) =>
        g -> arr.zipWithIndex.map { case (prev, cid) =>
          stats.get((g, cid)) match {
            case Some(r) =>
              val n = r.getLong(2)
              Array.tabulate(d)(j => r.getLong(3 + j) / n)
            case None => prev // emptied fine cluster keeps its centroid
          }
        }
      }
      i += 1
    }

    pts.select(col("__id").as(idCol), col("__g").as("coarse"),
        fineCol(cents)._1.as("fine"))
      .withColumn("cluster",
        col("coarse").cast("long") * lit(maxK.toLong) + col("fine").cast("long"))
  }

  /** Persist a trained centroid matrix as a tiny parquet table — the
    * [[graft.operators.IvfPq.saveModel]] serving discipline applied to
    * flat k-means: fit once, save, and every later session assigns
    * WITHOUT refitting. Layout: one `meta` row carrying (dim, scale, k)
    * in its vals, then one row per centroid (cid-keyed) — 1 + k rows,
    * model-sized, never data-sized. The centroids are the fixed-point
    * LONGS [[fit]] returned, so a save/load round trip is exact by
    * construction and a served assignment replays [[assign]]'s
    * arithmetic bit-identically (q201's oracle is q94's VERBATIM).
    */
  def saveModel(spark: SparkSession, centroids: Array[Array[Long]],
                scale: Long, table: String): Unit = {
    import spark.implicits._
    require(centroids.nonEmpty, "need at least one centroid")
    val d = centroids(0).length
    require(centroids.forall(_.length == d), "ragged centroid matrix")
    val meta = Seq(("meta", 0, Seq(d.toLong, scale, centroids.length.toLong)))
    val rows = centroids.zipWithIndex.toSeq.map { case (c, i) =>
      ("c", i, c.toSeq) }
    graft.sources.Sinks.dropTableAndStaleLocation(spark, table)
    (meta ++ rows).toDF("kind", "cid", "vals")
      .coalesce(1).write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Load a [[saveModel]] table back: (centroids, scale). */
  def loadModel(spark: SparkSession, table: String): (Array[Array[Long]], Long) = {
    val rows = spark.table(table).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val meta = rows.find(_._1 == "meta")
      .getOrElse(throw new IllegalStateException(s"no meta row in $table"))._3
    val Array(d, scale, k) = meta
    val cs = rows.filter(_._1 == "c").sortBy(_._2).map(_._3)
    require(cs.length == k.toInt, s"expected $k centroid rows, got ${cs.length}")
    require(cs.forall(_.length == d.toInt), s"expected dim $d centroids")
    (cs, scale)
  }

  /** Assign `points` against a PERSISTED model ([[saveModel]]) without
    * refitting — the serve path: one table read of 1 + k model rows,
    * one broadcast, then the same map-only native argmin scan
    * [[assign]] ends with (identical scaling, arithmetic, and
    * lowest-cid tiebreak — a lossy round trip would hash-mismatch
    * against the fit oracle). Returns (idCol, `cluster`).
    */
  def assignFromStore(spark: SparkSession, table: String, points: DataFrame,
                      idCol: String, vecCol: String): DataFrame = {
    val (cs, scale) = loadModel(spark, table)
    val b = spark.sparkContext.broadcast(cs)
    points.select(col(idCol),
      transform(col(vecCol), x =>
        floor(x.cast("double") * lit(scale.toDouble)).cast("long")).as("__x"))
      .select(col(idCol), nearestCentroidBcast(col("__x"), b).as("cluster"))
  }
}

/** Argmin over a literal centroid matrix for one scaled-long point: exact
  * long squared distances, strict `<` so ties keep the LOWEST cid — the
  * same arithmetic and tiebreak as [[KMeans.nearestCentroidBuiltin]]
  * (pinned in KMeansSpec). Null input, a null element, or a vector whose
  * dimension does not match the centroids', yields null (the
  * uniform-dimension requirement is part of [[KMeans.assign]]'s
  * contract). DOMAIN NOTE: distances must fit a long — [[KMeans.assign]]'s
  * scale keeps d·(2·scale)² ≪ 2⁶³; outside that domain this native loop
  * wraps where the ANSI-mode HOF reference would throw, so the parity pin
  * holds only on the documented domain.
  */
case class NearestCentroidExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    centroids: Seq[Seq[Long]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(centroids.nonEmpty, "need at least one centroid")
  @transient private lazy val mat: Array[Array[Long]] =
    centroids.map(_.toArray).toArray

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    // null elements propagate to a null cid (the HOF parity form's
    // behavior), rather than crashing toLongArray — see the shared kernel
    NearestCentroidEval.nearest(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], mat)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): NearestCentroidExpr =
    copy(child = newChild)
}

/** [[NearestCentroidExpr]] with the centroid matrix behind a BROADCAST
  * handle instead of a constructor literal: the expression node (and with
  * it the plan string, analyzed tree, and every serialized task closure)
  * is O(1) in k — KMeansSpec pins SizeEstimator(k=512) ≈
  * SizeEstimator(k=24) — while executors fetch the matrix once per node
  * via the torrent broadcast. Identical arithmetic, null handling, and
  * (dist, cid) tiebreak (spec-pinned against both sibling forms); the
  * same long-domain note as [[NearestCentroidExpr]] applies.
  */
case class NearestCentroidBcastExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    centroids: org.apache.spark.broadcast.Broadcast[Array[Array[Long]]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val mat = centroids.value
    NearestCentroidEval.nearest(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], mat)
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): NearestCentroidBcastExpr =
    copy(child = newChild)
}

/** Per-GROUP nearest centroid for two-level Lloyd
  * ([[KMeans.assignTwoLevel]]): the broadcast carries one centroid block
  * per coarse group, the group child selects the block, and the argmin
  * runs only over that block — per-point cost is the BLOCK size, not the
  * total cluster count. Null group, a group with no block, or a
  * null/mismatched vector yields null.
  */
case class NearestCentroidGroupExpr(
    group: org.apache.spark.sql.catalyst.expressions.Expression,
    vec: org.apache.spark.sql.catalyst.expressions.Expression,
    centroids: org.apache.spark.broadcast.Broadcast[Map[Int, Array[Array[Long]]]])
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: org.apache.spark.sql.catalyst.expressions.Expression = group
  override def right: org.apache.spark.sql.catalyst.expressions.Expression = vec
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(g: Any, v: Any): Any =
    centroids.value.get(g.asInstanceOf[Int]) match {
      case Some(mat) => NearestCentroidEval.nearest(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], mat)
      case None => null
    }

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression): NearestCentroidGroupExpr =
    copy(group = newLeft, vec = newRight)
}

/** The shared argmin kernel of the three nearest-centroid forms: exact
  * long squared distances, strict `<` keeps the LOWEST cid on ties, null
  * elements / dimension mismatch yield null (boxed Integer or null out).
  */
private[operators] object NearestCentroidEval {
  def nearest(arr: org.apache.spark.sql.catalyst.util.ArrayData,
              mat: Array[Array[Long]]): Any = {
    if (mat.isEmpty) return null
    val d = mat(0).length
    if (arr.numElements() != d) return null
    val x = new Array[Long](d)
    var e = 0
    while (e < d) {
      if (arr.isNullAt(e)) return null
      x(e) = arr.getLong(e)
      e += 1
    }
    var best = Long.MaxValue
    var bestCid = 0
    var j = 0
    while (j < mat.length) {
      val c = mat(j)
      var s = 0L
      var i = 0
      while (i < d) {
        val diff = x(i) - c(i)
        s += diff * diff
        i += 1
      }
      if (s < best) { best = s; bestCid = j }
      j += 1
    }
    java.lang.Integer.valueOf(bestCid)
  }
}
