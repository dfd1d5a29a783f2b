package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss dimensionality reduction with a ±1 SIGN matrix
  * (Achlioptas 2003: a Rademacher projection preserves pairwise
  * distances in expectation exactly like a Gaussian one, with integer
  * arithmetic): y_j = Σ_i sign(i, j) · x_i over the scaled-long
  * coordinates — the embedding-pipeline shrink step before LSH/IVF when
  * the source dimension is large.
  *
  * Determinism is the whole design: coordinates quantize to longs (the
  * KMeans fixed-point discipline), each sign is the parity of the
  * portable 60-bit hash of `(salt, i, j)` — a pure function of position,
  * no stored matrix, no RNG state — and every output component is an
  * exact commutative long sum. The projection therefore replays
  * bit-identically across runs, partitionings, and engines (q175's
  * DuckDB oracle recomputes every sign and sum), and re-projecting a
  * grown corpus never changes existing rows.
  *
  * Scale shape: entirely per-row array arithmetic inside one projection
  * — no shuffle, no join. The k×d sign matrix is PRECOMPUTED once on
  * the driver (one md5 per cell — the same portable hash the q175
  * oracle recomputes cell by cell) and rides the plan as a literal
  * array: per-row work is pure multiply-accumulate. The first matrix
  * drafted signs per ROW×cell instead (hash inside the fold) — same
  * bits, but ~10M md5 evaluations at sf0.1 made the projection
  * md5-bound at 5 s; the literal matrix runs the identical output in a
  * fraction of that. d is probed from one row and enforced uniform (the
  * KMeans vector contract).
  */
object RandomProjection {

  /** Driver-side twin of [[PortableHash.hash60]] — first 15 md5 hex
    * chars as a long (byte-parity pinned in RandomProjectionSpec).
    */
  private def hash60Driver(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_))
        .mkString.take(15), 16)

  /** Long-exact projection: one row per (idCol, component j in [0, k)),
    * `y` = the signed sum of scaled coordinates. Null or empty vectors
    * are excluded; all non-empty vectors must share one dimension.
    */
  def projectSigned(df: DataFrame, idCol: String, vecCol: String, k: Int,
                    scale: Long = 1000000L, salt: String = "rp"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val vecs = df.select(col(idCol), col(vecCol).as("__v"))
      .filter(col("__v").isNotNull && size(col("__v")) > 0)
    // one bounded driver read probes the dimension; the matrix is k×d ±1s
    val dims = vecs.select(size(col("__v")).as("d")).distinct().limit(2).collect()
    if (dims.isEmpty) {
      import org.apache.spark.sql.types._
      return df.sparkSession.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(df.schema(idCol),
          StructField("j", LongType, nullable = false),
          StructField("y", LongType, nullable = false))))
    }
    require(dims.length == 1,
      s"projectSigned requires a uniform vector dimension, found several")
    val d = dims.head.getInt(0)
    val signs: Seq[Seq[Long]] = Seq.tabulate(k, d)((j, i) =>
      if (hash60Driver(s"$salt:$i:$j") % 2 == 0) 1L else -1L)
    val xs = transform(col("__v"),
      x => floor(x.cast("double") * lit(scale.toDouble)).cast("long"))
    // each component unrolls STATICALLY (signs folded into +/- terms):
    // d·k primitive adds inside whole-stage codegen — the higher-order
    // aggregate form paid per-element lambda dispatch instead (measured
    // 3.6 s vs 0.5 s at sf0.1 for d=64, k=8)
    val y = array((0 until k).map { j =>
      (0 until d).map { i =>
        val t = element_at(col("__xs"), i + 1)
        if (signs(j)(i) > 0L) t else -t
      }.reduce(_ + _)
    }: _*)
    vecs
      .withColumn("__xs", xs)
      .withColumn("__y", y)
      .select(col(idCol), posexplode(col("__y")).as(Seq("j", "y")))
      .select(col(idCol), col("j").cast("long").as("j"), col("y"))
  }
}
