package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization for embedding search — the third compression
  * point on this engine's ANN ladder (brute exact → SQ8 → PQ/IVF-PQ,
  * mirroring the FAISS ScalarQuantizer/ProductQuantizer pair): each
  * dimension quantizes INDEPENDENTLY to `levels` codes over its own
  * [min, max] range, trading 8× memory (float32 → uint8) for far less
  * distortion than PQ's codebook sharing when dimensions are
  * heterogeneous, at the cost of no sub-vector table lookups.
  *
  * Everything is exact-long arithmetic (the [[ProductQuantizer]]
  * discipline): vectors scale to longs, the per-dimension affine code is
  *
  *   code_j(x) = clamp(⌊(x_j − min_j) · (levels−1) / (max_j − min_j)⌋,
  *               0, levels−1)        (max_j = min_j ⇒ 0)
  *
  * and the query–candidate distance is the code-domain squared L2 —
  * integers end to end, so fit + encode + search replay bit-identically
  * in the DuckDB oracle (zero tolerance), and the distance expression is
  * STATICALLY UNROLLED over dimensions inside whole-stage codegen (the
  * q175 lesson: HOF folds don't codegen).
  *
  * Scale shape: fit is ONE aggregate scan collecting 2·dim longs (the
  * model — driver-sized by construction); search is one projection over
  * the corpus terminated by TakeOrdered (never a global sort). The
  * brute scan is the SQ8 baseline; composing with [[IvfPq]]'s cell
  * pruning gives the IVF-SQ layout the same way PQ composes there.
  */
object ScalarQuantizer {

  /** Per-dimension code ranges (scaled-long domain). */
  final case class Model(mins: Array[Long], maxs: Array[Long],
                         scale: Long, levels: Int) {
    def dim: Int = mins.length
  }

  private def scaled(points: DataFrame, idCol: String, vecCol: String,
                     scale: Long): DataFrame =
    points.select(col(idCol).as("vec_id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(scale.toDouble)).cast("long")).as("x"))

  /** ONE aggregate scan → 2·dim longs on the driver. */
  def fit(points: DataFrame, idCol: String, vecCol: String, dim: Int,
          scale: Long = 1000000L, levels: Int = 256): Model = {
    require(dim >= 1 && levels >= 2 && scale >= 1, "dim>=1, levels>=2, scale>=1")
    val aggs = (0 until dim).flatMap(j => Seq(
      min(element_at(col("x"), j + 1)), max(element_at(col("x"), j + 1))))
    val row = scaled(points, idCol, vecCol, scale).agg(aggs.head, aggs.tail: _*).head()
    val mins = Array.tabulate(dim)(j => row.getLong(2 * j))
    val maxs = Array.tabulate(dim)(j => row.getLong(2 * j + 1))
    Model(mins, maxs, scale, levels)
  }

  /** The affine code of scaled coordinate `xj` in dimension j. */
  private def codeExpr(m: Model, j: Int, xj: Column): Column = {
    val (mn, mx) = (m.mins(j), m.maxs(j))
    if (mx == mn) lit(0L)
    else least(greatest(
      graft.functions.IntOps.intDiv((xj - mn) * (m.levels - 1).toLong,
        lit(mx - mn)), lit(0L)), lit((m.levels - 1).toLong))
  }

  private def codeOf(m: Model, v: Array[Long], j: Int): Long = {
    val (mn, mx) = (m.mins(j), m.maxs(j))
    if (mx == mn) 0L
    else math.min(math.max((v(j) - mn) * (m.levels - 1) / (mx - mn), 0L),
      (m.levels - 1).toLong)
  }

  /** Brute code-domain top-k for the corpus vector `queryId`: fit,
    * encode the query on the driver, and scan with the unrolled
    * per-dimension (q_j − code_j)² sum. Returns (cand_id, sq_dist),
    * query excluded, ties to the lowest id.
    */
  def sqTopK(points: DataFrame, idCol: String, vecCol: String, dim: Int,
             queryId: Long, topK: Int, scale: Long = 1000000L,
             levels: Int = 256): DataFrame = {
    val pts = scaled(points, idCol, vecCol, scale)
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val m = fit(points, idCol, vecCol, dim, scale, levels)
    val qv = pts.filter(col("vec_id") === queryId).head().getSeq[Long](1).toArray
    require(qv.length == dim, s"query vector has dim ${qv.length}, expected $dim")
    val dist: Column = (0 until dim).map { j =>
      val d = codeExpr(m, j, element_at(col("x"), j + 1)) - codeOf(m, qv, j)
      d * d
    }.reduce(_ + _)
    pts.filter(col("vec_id") =!= queryId)
      .select(col("vec_id").as("cand_id"), dist.as("sq_dist"))
      .orderBy(col("sq_dist").asc, col("cand_id").asc)
      .limit(topK)
  }
}
