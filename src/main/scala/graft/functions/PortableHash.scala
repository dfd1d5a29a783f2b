package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 60-bit hash family computable bit-identically by Spark AND by any ANSI
  * SQL engine with `md5` (the correctness oracle runs it in DuckDB).
  *
  * Design constraints, all driven by cross-engine parity:
  *  - base hash = first 15 hex chars of md5 → a NON-NEGATIVE value < 2^60,
  *    so arithmetic never touches the sign bit;
  *  - permutations are rotate-then-xor in the 60-bit domain, with the
  *    rotation expressed as `(h % 2^(60-r)) * 2^r + (h >> (60-r))` —
  *    multiply-of-bounded-value plus right-shift only. Left shifts are
  *    avoided entirely: they overflow-error in DuckDB and are the one
  *    bitwise op engines disagree on;
  *  - rotation/xor constants are derived driver-side (plain Scala) and
  *    embedded as literals in both the Spark plan and the generated SQL.
  *
  * The xxhash64-based sketches in [[SketchExpressions]] remain the fast
  * path for production pipelines (xxhash64 is ~an order of magnitude
  * cheaper than md5); this family exists so the SAME sketch/dedup operator
  * shapes can be verified end-to-end against an external SQL oracle.
  */
object PortableHash {

  val Mask60: Long = (1L << 60) - 1

  /** 60-bit base hash: value of the first 15 hex chars of md5(s) —
    * natively ([[SketchExpressions.hash60]] reads the digest's top 60
    * bits directly, skipping the hex-string materialization and base-16
    * re-parse the built-in chain pays). Bit-equal to [[hash60Builtin]],
    * pinned in FunctionsSpec; the SQL oracle keeps the built-in
    * formulation ([[hash60Sql]]) — that equivalence IS the portability
    * contract.
    */
  def hash60(c: Column): Column =
    SketchExpressions.hash60(c.cast("string"))

  /** The pure-built-in formulation, kept as the cross-engine parity
    * reference (and the exact shape [[hash60Sql]] mirrors in DuckDB).
    */
  def hash60Builtin(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Rotate a 60-bit value left by r (1 <= r <= 59): no left shifts. */
  def rot60(h: Column, r: Int): Column = {
    require(r > 0 && r < 60, s"rotation out of range: $r")
    val low = 1L << (60 - r) // h % low keeps the bits that rotate up
    (h % lit(low)) * lit(1L << r) + shiftright(h, 60 - r)
  }

  /** Permutation j: rotate by rot, xor a 60-bit constant. */
  def permute(h: Column, rot: Int, xorConst: Long): Column =
    rot60(h, rot).bitwiseXOR(lit(xorConst))

  /** Deterministic (rotation, xor-constant) pairs for k permutations —
    * a driver-side xorshift, masked into the 60-bit domain.
    */
  def permConstants(k: Int, seed: Long = 42L): Seq[(Int, Long)] = {
    var s = seed
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    (0 until k).map { j =>
      val r = 1 + (math.abs(next()) % 59L).toInt
      (r, next() & Mask60)
    }
  }

  /** Order-sensitive rolling fingerprint of an array<string>: fold
    * `acc' = rot60(acc, 7) xor hash60(token)` from 0. Empty array → 0.
    */
  def fingerprint60(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, t) => rot60(acc, 7).bitwiseXOR(hash60(t)))

  // ---------- SQL-side generators (same constants, same arithmetic) ----------

  /** DuckDB expression computing [[hash60]] of SQL expression `e`. */
  def hash60Sql(e: String): String = s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** DuckDB expression computing [[rot60]] of SQL expression `e`. */
  def rot60Sql(e: String, r: Int): String = {
    val low = 1L << (60 - r)
    s"((($e) % $low) * ${1L << r} + (($e) >> ${60 - r}))"
  }

  /** DuckDB expression computing [[permute]] of SQL expression `e`. */
  def permuteSql(e: String, rot: Int, xorConst: Long): String =
    s"xor(${rot60Sql(e, rot)}, ${xorConst}::BIGINT)"
}
