package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column (north-star extension, BASELINE.json).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast, so
  *    the candidate side streams through a map-side join with no shuffle of
  *    the (huge) candidate table; the only shuffle is the final per-query
  *    top-k window over |Q|·k rows.
  *  - [[lshTopK]]: random-hyperplane LSH buckets restrict scoring to
  *    candidates sharing a bucket with the query, turning the broadcast-scan
  *    into a bucket-equi-join that prunes most of the corpus.
  *  - [[ivfTopK]]: the 100 TB scale path — an IVF coarse quantizer whose
  *    centroids are plan literals, so cell assignment is a pure per-row
  *    projection (no shuffle); queries probe only their nprobe nearest cells.
  *
  * All pair scoring uses [[VectorFunctions.cosineFromNormSq]]: squared norms
  * are computed once per row before the join, so each candidate pair costs a
  * single dot product.
  */
object Similarity {

  /** Exact top-k cosine neighbors for every query row.
    * @param emb       (idCol, vecCol) corpus
    * @param queries   (idCol, vecCol) query set — must be broadcast-sized
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorFunctions.normSq(col(vecCol)).as("qn"))
    val c = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      VectorFunctions.normSq(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("qv"), col("cv")), col("qn"), col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos_sim"), col("rank"))
  }

  /** IVF-style ANN: a coarse quantizer partitions the corpus into nlist
    * cells (centroids drawn deterministically from the data — every
    * (n/nlist)-th vector by id, the seeded stand-in for a k-means fit).
    * The tiny centroid table is collected driver-side and embedded in the
    * plan as literals, so assignment and probe selection are pure
    * projections: at 100 TB the corpus is never shuffled for assignment —
    * one scan tags each vector with its cell, and search cost scales with
    * nprobe/nlist of the corpus. The cell id is also the natural
    * bucketing/partition key for storage.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val n = emb.count()
    val step = math.max(n / nlist, 1L)
    val cents: Seq[(Long, Array[Double], Double)] = emb
      .filter(col(idCol) % step === 0)
      .orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect().toSeq
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        (r.getLong(0), v, math.sqrt(v.map(x => x * x).sum))
      }
      .filter(_._3 > 0d) // a zero-norm centroid can never win a cosine argmax

    // Per-row similarity to every centroid. ||v|| is constant across cells,
    // so argmax over dot(v,c)/||c|| equals argmax over cosine — the sqrt of
    // the row norm is skipped entirely during assignment. The struct packs
    // (sim, -cell_id) so array_max/array_sort break ties toward the smallest
    // cell id.
    def cellSims(v: Column): Column = array(cents.map { case (cid, cv, cnorm) =>
      struct((VectorFunctions.dot(v, lit(cv)) / lit(cnorm)).as("sim"),
        lit(-cid).as("nc"))
    }: _*)

    val assigned = emb.select(
      col(idCol).as("cand_id"), col(vecCol).as("cv"),
      VectorFunctions.normSq(col(vecCol)).as("cn"),
      (array_max(cellSims(col(vecCol))).getField("nc") * -1).as("cell_id"))

    // probe the nprobe nearest cells per query (sort desc by (sim, -cell_id))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        VectorFunctions.normSq(col(vecCol)).as("qn"),
        explode(slice(reverse(array_sort(cellSims(col(vecCol)))), 1, nprobe)).as("probe"))
      .select(col("query_id"), col("qv"), col("qn"),
        (col("probe.nc") * -1).as("cell_id"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("qv"), col("cv")), col("qn"), col("cn")), 6))
      .select(col("query_id"), col("cand_id"), col("cos_sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: score only candidates in the query's hyperplane
    * bucket. Multi-probe = also search buckets at Hamming distance 1 when
    * `probeBits > 0` (improves recall at bounded extra cost).
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nPlanes: Int = 12, probeBits: Int = 0, dim: Int = 64,
              seed: Long = 42L): DataFrame = {
    val planes = VectorFunctions.seededPlanes(nPlanes, dim, seed)
    val bucketOf = (v: Column) => VectorFunctions.hyperplaneBucket(v, planes)
    val c = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      VectorFunctions.normSq(col(vecCol)).as("cn"),
      bucketOf(col(vecCol)).as("bucket"))
    val baseQ = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorFunctions.normSq(col(vecCol)).as("qn"),
      bucketOf(col(vecCol)).as("bucket0"))
    // probe the home bucket plus single-bit flips of the first `probeBits` planes
    val probes = lit(0L) +: (0 until probeBits).map(i => shiftleft(lit(1L), i))
    val q = baseQ.select(col("query_id"), col("qv"), col("qn"),
        explode(array(probes.map(p => col("bucket0").bitwiseXOR(p)): _*)).as("bucket"))
      .distinct()
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", round(VectorFunctions.cosineFromNormSq(
        VectorFunctions.dot(col("qv"), col("cv")), col("qn"), col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.select(col("query_id"), col("cand_id"), col("cos_sim")).distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
