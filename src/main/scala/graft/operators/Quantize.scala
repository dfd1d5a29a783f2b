package graft.operators

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of embedding vectors — the 4× storage/bandwidth
  * reduction step an ANN index applies before sharding a 100 TB embedding
  * corpus (the IVF/LSH operators then score quantized codes and re-rank the
  * short list at full precision).
  *
  * Per-vector min-max quantization: code = floor((x − vmin)·255 / (vmax −
  * vmin)), clamped to 255; a constant vector (vmax == vmin) quantizes to
  * all-zero codes. Everything is per-row array arithmetic over doubles
  * (float→double widening is exact) with a fixed operation order, so an
  * external engine replays the codes bit-identically — floor runs BEFORE
  * the integer cast because DuckDB's double→BIGINT cast rounds where
  * Spark's truncates, and an integral value casts identically in both.
  */
object Quantize {

  /** Adds `vmin`, `vmax` (per-vector, double) and `codes` (array<long> of
    * 0..255) for the float/double array column `vecCol`.
    *
    * Non-finite elements (NaN/±Inf) quantize the whole vector to all-zero
    * codes with null vmin/vmax, the same degenerate bucket as a constant
    * vector: without the guard a single NaN makes vmax NaN, Spark casts
    * the NaN code to 0 while DuckDB's CAST(NaN AS BIGINT) ERRORS — so a
    * poisoned corpus would crash a replaying engine instead of diverging
    * visibly. (The multimodal poison-row contract, applied to floats.)
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    // Staged projection (the BM25/q52 lesson): bind the widened array and
    // the per-vector bounds as COLUMNS and reference those in the codes
    // lambda. Inlining the array_min/array_max expression trees into the
    // lambda body would re-evaluate them per ELEMENT — O(d²) per vector.
    // CollapseProject keeps non-cheap aliases with multiple consumers in
    // their own Project, so each bound is computed once per row.
    val v = col("__v")
    val finite = forall(v, x =>
      !isnan(x) && x > lit(Double.NegativeInfinity) && x < lit(Double.PositiveInfinity))
    val vmin = col("vmin")
    val vmax = col("vmax")
    df.withColumn("__v", transform(col(vecCol), x => x.cast("double")))
      .withColumn("__finite", finite)
      .withColumn("vmin", when(col("__finite"), array_min(v)))
      .withColumn("vmax", when(col("__finite"), array_max(v)))
      .withColumn("codes",
        when(vmax > vmin,
          transform(v, x =>
            least(floor((x - vmin) * 255.0 / (vmax - vmin)).cast("long"), lit(255L))))
          .otherwise(transform(v, _ => lit(0L))))
      .drop("__v", "__finite")
  }

  /** Reconstruction of a codes array back to doubles:
    * vmin + code·(vmax − vmin) / 255.
    */
  def dequantizeInt8(codes: Column, vmin: Column, vmax: Column): Column =
    transform(codes, c => vmin + c.cast("double") * (vmax - vmin) / 255.0)

  /** Order-sensitive integer checksum of a codes array in the portable
    * 60-bit domain (rotate-xor fold — no left shifts, no overflow, same
    * value in any engine with the [[PortableHash]] SQL forms).
    */
  def codeChecksum(codes: Column): Column =
    aggregate(codes, lit(0L), (acc, c) => PortableHash.rot60(acc, 5).bitwiseXOR(c))
}
