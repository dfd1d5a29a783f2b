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
  * — no shuffle, no join, no broadcast. The d·k hash evaluations per row
  * are the price of the matrix-free form; a corpus-scale deployment with
  * large d·k would precompute the k×d sign matrix once and broadcast it
  * (same output, one hash per cell instead of one per row×cell), which
  * composes with this implementation unchanged.
  */
object RandomProjection {

  /** Long-exact projection: one row per (idCol, component j in [0, k)),
    * `y` = the signed sum of scaled coordinates. Null or empty vectors
    * are excluded.
    */
  def projectSigned(df: DataFrame, idCol: String, vecCol: String, k: Int,
                    scale: Long = 1000000L, salt: String = "rp"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val xs = transform(col(vecCol),
      x => floor(x.cast("double") * lit(scale.toDouble)).cast("long"))
    def sign(i: Column, j: Column): Column =
      when(pmod(PortableHash.hash60(
        concat(lit(salt + ":"), i.cast("string"), lit(":"), j.cast("string"))),
        lit(2)) === 0, lit(1L)).otherwise(lit(-1L))
    val y = transform(sequence(lit(0), lit(k - 1)), j =>
      aggregate(sequence(lit(0), size(col("__xs")) - 1), lit(0L),
        (acc, i) => acc + sign(i, j) * element_at(col("__xs"), (i + 1).cast("int"))))
    df.select(col(idCol), xs.as("__xs"))
      .filter(col("__xs").isNotNull && size(col("__xs")) > 0)
      .withColumn("__y", y)
      .select(col(idCol), posexplode(col("__y")).as(Seq("j", "y")))
      .select(col(idCol), col("j").cast("long").as("j"), col("y"))
  }
}
