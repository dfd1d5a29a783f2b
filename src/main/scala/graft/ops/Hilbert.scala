package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve index for two-dimensional data layout — [[ZOrder]]'s
  * sibling with the stronger locality guarantee: consecutive curve
  * positions are ALWAYS grid neighbors (Manhattan distance 1, pinned in
  * HilbertSpec), where the Z-curve takes long diagonal jumps at block
  * boundaries. Files clustered on the Hilbert index therefore get
  * tighter per-file min/max ranges on both columns — the reason
  * lakehouse writers offer it alongside Z-order.
  *
  * The index is the standard iterative base-case decomposition (the
  * xy2d walk of Hilbert 1891 via the bit-twiddling form): for each level
  * `s = 2^(bits-1) … 1`, the quadrant bits (rx, ry) contribute
  * `s² · ((3·rx) XOR ry)` to the distance and the coordinate frame
  * rotates/reflects for the next level. Each level is staged as its own
  * projection — the per-level (x, y, d) columns are multi-consumer
  * non-cheap expressions, so CollapseProject keeps them staged and the
  * expression tree stays LINEAR in `bits` (the staged-projection
  * discipline; pinned by a plan-size check in HilbertSpec). All
  * arithmetic is +, *, &, XOR and CASE on longs — no left shifts — so
  * the DuckDB oracle replays it verbatim ([[hilbertSql]]).
  *
  * Inputs must lie in [0, 2^bits); `2·bits` must stay ≤ 62.
  */
object Hilbert {

  /** Append `outCol` = Hilbert index of (`x`, `y`) under a 2^bits ×
    * 2^bits grid, staging one projection per level.
    */
  def withHilbert(df: DataFrame, x: Column, y: Column, bits: Int,
                  outCol: String): DataFrame = {
    require(bits > 0 && 2 * bits <= 62, s"bits must be in (0, 31]: $bits")
    val base = df.columns.map(col)
    var cur = df.select(base :+ x.cast("long").as("__hx")
      :+ y.cast("long").as("__hy") :+ lit(0L).as("__hd"): _*)
    var lvl = bits - 1
    while (lvl >= 0) {
      val s = 1L << lvl
      // stage the quadrant bits: each is consumed three times below
      cur = cur.select(cur.columns.map(col)
        :+ when(col("__hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L).as("__rx")
        :+ when(col("__hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L).as("__ry"): _*)
      val nx = when(col("__ry") === 1L, col("__hx"))
        .when(col("__rx") === 1L, lit(s - 1) - col("__hy"))
        .otherwise(col("__hy"))
      val ny = when(col("__ry") === 1L, col("__hy"))
        .when(col("__rx") === 1L, lit(s - 1) - col("__hx"))
        .otherwise(col("__hx"))
      val nd = col("__hd") +
        lit(s * s) * (lit(3L) * col("__rx")).bitwiseXOR(col("__ry"))
      cur = cur.select(base :+ nx.as("__hx") :+ ny.as("__hy")
        :+ nd.as("__hd"): _*)
      lvl -= 1
    }
    cur.select(base :+ col("__hd").as(outCol): _*)
  }

  /** SQL (DuckDB) replay of [[withHilbert]]: the same per-level unroll
    * as nested selects. `keys` are passed through; `xExpr`/`yExpr` are
    * evaluated once in the innermost select.
    */
  def hilbertSql(from: String, keys: Seq[String], xExpr: String,
                 yExpr: String, bits: Int, outCol: String): String = {
    val ks = keys.mkString(", ")
    var inner =
      s"SELECT $ks, CAST($xExpr AS BIGINT) AS x, CAST($yExpr AS BIGINT) AS y, CAST(0 AS BIGINT) AS d FROM $from"
    var lvl = bits - 1
    while (lvl >= 0) {
      val s = 1L << lvl
      val rx = s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
      inner =
        s"""SELECT $ks,
           |  CASE WHEN ry = 1 THEN x WHEN rx = 1 THEN ${s - 1} - y ELSE y END AS x,
           |  CASE WHEN ry = 1 THEN y WHEN rx = 1 THEN ${s - 1} - x ELSE x END AS y,
           |  d + ${s * s} * xor(3 * rx, ry) AS d
           |FROM (SELECT $ks, x, y, d, $rx AS rx, $ry AS ry FROM ($inner))""".stripMargin
      lvl -= 1
    }
    s"SELECT $ks, d AS $outCol FROM ($inner)"
  }

  /** Driver-side reference (the same walk on plain longs) — spec parity
    * and small-scale tooling.
    */
  def hilbertIndex(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Range-partition and sort along the curve — the write-side
    * clustering step, same one-exchange cost as [[ZOrder.clusterByZ]].
    */
  def clusterByHilbert(df: DataFrame, x: Column, y: Column, bits: Int,
                       numPartitions: Int): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    withHilbert(df, x, y, bits, "__hv")
      .repartitionByRange(numPartitions, col("__hv"))
      .sortWithinPartitions(col("__hv"))
      .drop("__hv")
  }
}
