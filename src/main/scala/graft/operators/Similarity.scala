package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column (north-star extension, BASELINE.json).
  *
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast, so
  *    the candidate side streams through a map-side join with no shuffle of
  *    the (huge) candidate table; the only shuffle is the final per-query
  *    top-k window over |Q|·k rows.
  *  - [[lshTopK]]: the 100 TB scale path — random-hyperplane LSH buckets
  *    restrict scoring to candidates sharing a bucket with the query, turning
  *    the broadcast-scan into a bucket-equi-join that prunes most of the
  *    corpus. Recall is tunable via number of planes / probe tables.
  */
object Similarity {

  /** Exact top-k cosine neighbors for every query row.
    * @param emb       (idCol, vecCol) corpus
    * @param queries   (idCol, vecCol) query set — must be broadcast-sized
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", round(VectorFunctions.cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos_sim"), col("rank"))
  }

  /** IVF-style ANN: a coarse quantizer partitions the corpus into nlist
    * cells (centroids drawn deterministically from the data — every
    * (n/nlist)-th vector by id, the seeded stand-in for a k-means fit);
    * each vector is assigned to its nearest centroid once, and a query
    * scores only the vectors in its `nprobe` nearest cells. At 100 TB the
    * assignment is one broadcast-join scan and search cost scales with
    * nprobe/nlist of the corpus; the cell id is also the natural
    * bucketing/partition key for storage.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.Column
    val n = emb.count()
    val step = math.max(n / nlist, 1L)
    val centroids = emb
      .filter(col(idCol) % step === 0)
      .limit(nlist)
      .select(col(idCol).as("cell_id"), col(vecCol).as("centroid"))
    val cos: (Column, Column) => Column =
      (a, b) => VectorFunctions.cosine(a, b)

    // assignment: nearest centroid per corpus vector (broadcast scan)
    val wAssign = Window.partitionBy(col(idCol)).orderBy(col("__sim").desc, col("cell_id"))
    val assigned = emb.crossJoin(broadcast(centroids))
      .withColumn("__sim", cos(col(vecCol), col("centroid")))
      .withColumn("__rn", row_number().over(wAssign))
      .filter(col("__rn") === 1)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cv"), col("cell_id"))

    // probe the nprobe nearest cells per query
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("__sim").desc, col("cell_id"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("__sim", cos(col("qv"), col("centroid")))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell_id"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", round(cos(col("qv"), col("cv")), 6))
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
    val bucketOf = (v: org.apache.spark.sql.Column) => VectorFunctions.hyperplaneBucket(v, planes)
    val c = emb.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      bucketOf(col(vecCol)).as("bucket"))
    val baseQ = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      bucketOf(col(vecCol)).as("bucket0"))
    // probe the home bucket plus single-bit flips of the first `probeBits` planes
    val probes = lit(0L) +: (0 until probeBits).map(i => shiftleft(lit(1L), i))
    val q = baseQ.select(col("query_id"), col("qv"),
        explode(array(probes.map(p => col("bucket0").bitwiseXOR(p)): _*)).as("bucket"))
      .distinct()
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", round(VectorFunctions.cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.select(col("query_id"), col("cand_id"), col("cos_sim")).distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
