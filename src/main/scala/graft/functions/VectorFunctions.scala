package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, composed from
  * codegen'd built-ins (`zip_with` + `aggregate`) — no UDF serialization, no
  * shuffle. All arithmetic is promoted to double immediately so results are
  * deterministic and reproducible by an external double-precision oracle.
  */
object VectorFunctions {

  /** Dot product: native Catalyst expression (tight per-row loop; see
    * [[VectorExpressions]]). Accumulation order matches [[dotBuiltin]].
    */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Pure-built-in formulation (left-fold of pairwise products in element
    * order); kept as the parity reference for the native expression.
    * Note: propagates null for unequal-length arrays (zip_with pads with
    * null), where the native expression folds over the common prefix.
    */
  def dotBuiltin(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x
    )

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; null (not NaN) on zero-norm inputs, matching the
    * engine-wide §1.4 null policy.
    */
  def cosine(a: Column, b: Column): Column =
    cosineFromNormSq(dot(a, b), normSq(a), normSq(b))

  /** Cosine from a precomputed dot product and squared norms. The arithmetic
    * form is identical to [[cosine]] (`d / (sqrt(nsqA) * sqrt(nsqB))`), so
    * results are bit-for-bit equal — but pair-scoring operators can compute
    * each side's squared norm once per ROW (before the join) instead of
    * twice per PAIR, cutting the per-pair cost from three dot products to
    * one. At 100 TB the norm column is a few extra bytes per row against a
    * 3× reduction in the dominant CPU cost of similarity search.
    */
  def cosineFromNormSq(d: Column, nsqA: Column, nsqB: Column): Column = {
    val nn = sqrt(nsqA) * sqrt(nsqB)
    when(nn === 0d || nn.isNull, lit(null)).otherwise(d / nn)
  }

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, x) => acc + x
    )

  /** Random-hyperplane LSH bucket: `planes` is a fixed seed-derived matrix
    * (one row per plane); the bucket id packs the sign bits. Used for the
    * scale path of near-neighbor search: equal bucket ⇒ candidate pair, so a
    * 100 TB self-join becomes a per-bucket join instead of a cross join.
    */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(v, planeCol) >= 0d, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Deterministic pseudo-random unit-free hyperplanes from a seed — a tiny
    * xorshift-style generator run driver-side; no RNG state at executors.
    */
  def seededPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    var s = seed
    def next(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s % 1000003L).toDouble / 1000003.0
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next() * 2 - 1))
  }
}
