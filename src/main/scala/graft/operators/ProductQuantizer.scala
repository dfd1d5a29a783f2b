package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization with asymmetric-distance (ADC) search — Jégou
  * et al. 2011, the memory-bounded scan path of the ANN family: vectors
  * compress to m small codebook indices (here m·log₂k bits each), and a
  * query scans CODES, not vectors — per-vector cost m table lookups
  * instead of d multiplies, and the scan reads the code columns only.
  * Complements `Similarity`'s brute/LSH/IVF (which all read full
  * vectors) and q69's scalar quantization (which compresses but can't
  * skip the per-dimension arithmetic).
  *
  * Everything stays in the fixed-point integer domain of
  * [[KMeans.fit]]: codebooks are scaled-long Lloyd centroids per
  * subspace, codes are deterministic (dist, cid)-argmin indices, the
  * query's m×k distance table is exact long arithmetic computed once on
  * the driver (m·k·(d/m) ops — trivial), and the ADC score is a sum of
  * m exact longs — NO floats anywhere, so the whole pipeline (training
  * included) replays bit-exactly in an external SQL oracle.
  *
  * Scale shape: training = m driver-looped Lloyd fits over sliced
  * vectors (k·d longs of driver state each — the [[KMeans.assign]]
  * bound); encoding = ONE scan evaluating all m argmins against
  * broadcast codebooks (no joins); search = one scan of the codes frame
  * summing m literal-array lookups, terminated by TakeOrderedAndProject
  * — never a global sort. At a real 100 TB deployment the codes frame
  * is the materialized artifact (write it bucketed once, scan it per
  * query); the gate measures build + encode + one query, the honest
  * end-to-end cost.
  */
object ProductQuantizer {

  /** Train per-subspace codebooks — all m Lloyd chains BATCHED into one
    * scan + one m·k-row aggregate per round instead of m sequential
    * [[KMeans.fit]] calls (the chains are independent k-means over
    * disjoint slices of the same cached rows, so round r of every chain
    * can share one job; m·iterations small jobs collapse to iterations).
    * Every determinism ingredient of [[KMeans.fit]] is replayed
    * verbatim: same scaled-long coords, same k-lowest-id init (the same
    * k rows sliced per subspace), same (dist, cid) argmin, exact long
    * sums, truncating division, emptied clusters keep their centroid —
    * ProductQuantizerSpec pins bit-identity against the per-subspace
    * [[KMeans.fit]] loop.
    *
    * @return (subDim, codebooks[s][cid][j])
    */
  def train(points: DataFrame, idCol: String, vecCol: String, dim: Int,
            m: Int, k: Int, iterations: Int,
            scale: Long = 1000000L): Array[Array[Array[Long]]] = {
    require(m >= 1 && dim % m == 0,
      s"dim $dim must split evenly into $m subspaces")
    require(k >= 1, "k must be >= 1")
    require(iterations >= 0, "iterations must be >= 0")
    val subDim = dim / m
    val spark = points.sparkSession
    val scaled0 = points.select(
      col(idCol).as("__id"),
      transform(col(vecCol), x =>
        floor(x.cast("double") * lit(scale.toDouble)).cast("long")).as("__x"))
    val rdd = scaled0.rdd
    rdd.cache()
    try {
      val pts = spark.createDataFrame(rdd, scaled0.schema)
      // deterministic init: the k lowest-id points — the SAME rows every
      // per-subspace fit would pick, sliced per subspace
      val initRows = pts.orderBy(col("__id")).limit(k)
        .select(col("__x")).collect()
        .map(_.getSeq[Long](0).toArray)
      require(initRows.nonEmpty, "k-means needs at least one point")
      var books: Array[Array[Array[Long]]] = Array.tabulate(m)(s =>
        initRows.map(_.slice(s * subDim, (s + 1) * subDim)))
      var i = 0
      while (i < iterations) {
        val bs = books.map(spark.sparkContext.broadcast(_))
        val subStructs = (0 until m).map { s =>
          val sub = slice(col("__x"), s * subDim + 1, subDim)
          struct(lit(s).as("s"),
            KMeans.nearestCentroidBcast(sub, bs(s)).as("cid"),
            sub.as("v"))
        }
        val sumCols = (0 until subDim).map(j =>
          sum(element_at(col("v"), j + 1)).as(s"s$j"))
        val stats = pts
          .select(explode(array(subStructs: _*)).as("e"))
          .select(col("e.s"), col("e.cid"), col("e.v"))
          .groupBy(col("s"), col("cid"))
          .agg(count(lit(1)).as("n"), sumCols: _*)
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
        bs.foreach(_.destroy())
        books = Array.tabulate(m) { s =>
          books(s).zipWithIndex.map { case (prev, cid) =>
            stats.get((s, cid)) match {
              case Some(r) =>
                val n = r.getLong(2)
                Array.tabulate(subDim)(j => r.getLong(3 + j) / n)
              case None => prev // emptied cluster keeps its centroid
            }
          }
        }
        i += 1
      }
      books
    } finally rdd.unpersist(blocking = false)
  }

  /** Encode every vector to its m codebook indices in ONE scan.
    * @return (idCol, code_0 .. code_{m-1}) — int columns
    */
  def encode(points: DataFrame, idCol: String, vecCol: String, dim: Int,
             codebooks: Array[Array[Array[Long]]],
             scale: Long = 1000000L): DataFrame = {
    val m = codebooks.length
    val subDim = dim / m
    val spark = points.sparkSession
    val scaled = transform(col(vecCol), x =>
      floor(x.cast("double") * lit(scale.toDouble)).cast("long"))
    val codeCols = (0 until m).map { s =>
      val b = spark.sparkContext.broadcast(codebooks(s))
      KMeans.nearestCentroidBcast(
        slice(scaled, s * subDim + 1, subDim), b).as(s"code_$s")
    }
    points.select(col(idCol) +: codeCols: _*)
  }

  /** Exact long squared distance between a query subvector and one
    * centroid — the driver-side table entry.
    */
  private def distSq(q: Array[Long], c: Array[Long]): Long = {
    var acc = 0L
    var j = 0
    while (j < q.length) { val diff = q(j) - c(j); acc += diff * diff; j += 1 }
    acc
  }

  /** ADC top-k: nearest `topK` corpus vectors to `queryId` by the
    * quantized distance Σ_s table_s[code_s], ties to the lowest id;
    * the query itself is excluded.
    * @return (cand_id, adc_dist)
    */
  def adcTopK(points: DataFrame, idCol: String, vecCol: String, dim: Int,
              m: Int, k: Int, iterations: Int, queryId: Long, topK: Int,
              scale: Long = 1000000L): DataFrame = {
    val codebooks = train(points, idCol, vecCol, dim, m, k, iterations, scale)
    val codes = encode(points, idCol, vecCol, dim, codebooks, scale)
    val subDim = dim / m

    val qRow = points.filter(col(idCol) === queryId)
      .select(transform(col(vecCol), x =>
        floor(x.cast("double") * lit(scale.toDouble)).cast("long")))
      .head().getSeq[Long](0).toArray
    require(qRow.length == dim, s"query vector has dim ${qRow.length}, expected $dim")

    // m × k exact-long distance table, embedded as literal arrays — the
    // classic ADC table, k longs per subspace
    val tables = (0 until m).map { s =>
      val qSub = qRow.slice(s * subDim, (s + 1) * subDim)
      typedLit(codebooks(s).map(c => distSq(qSub, c)).toSeq)
    }
    val adc = (0 until m).map(s =>
      element_at(tables(s), col(s"code_$s") + 1)).reduce(_ + _)

    codes.filter(col(idCol) =!= queryId)
      .select(col(idCol).as("cand_id"), adc.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("cand_id").asc)
      .limit(topK)
  }
}
