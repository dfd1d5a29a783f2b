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

  // ------------------------------------------------------------------
  // n-dimensional Hilbert (Skilling, "Programming the Hilbert curve",
  // AIP Conf. Proc. 707 (2004) 381): AxesToTranspose — per bit level,
  // each dimension either inverts the low bits of dim 0 or exchanges
  // low bits with it, then a Gray-style fold — followed by the Morton
  // interleave of the transposed form (dim 0 most significant within a
  // level). Same staging discipline as the 2-D walk: every level×dim
  // update is its own projection with the shared xor-mask staged, so
  // the expression tree is LINEAR in bits·dims; all arithmetic is
  // &, XOR, CASE and multiplies by literal powers of two (no shifts
  // except the oracle-safe `>>`), replayed verbatim by the oracle.
  // Bijectivity and the unit-step adjacency property are spec-pinned
  // for n = 2..4 (HilbertSpec). Inputs in [0, 2^bits); dims·bits ≤ 62.
  // ------------------------------------------------------------------

  /** Append `outCol` = n-D Hilbert index of `coords` (one column per
    * dimension). The walk runs as ONE native expression per row
    * ([[HilbertNExpr]] — the [[hilbertIndexN]] loop verbatim): a staged
    * column formulation of the bits·dims Skilling steps stacked enough
    * projections that whole-stage codegen bailed out and the whole plan
    * fell back to interpreted expression eval (measured 3.1 s at sf0.1
    * vs 0.2 s native) — exactly the hot-loop case the native-expression
    * preference exists for. The ORACLE still replays the identical
    * staged arithmetic relationally ([[hilbertNSql]]), so the native
    * loop is cross-engine-verified by every gate run.
    */
  def withHilbertN(df: DataFrame, coords: Seq[Column], bits: Int,
                   outCol: String): DataFrame = {
    val n = coords.size
    require(n >= 2, "need at least 2 dimensions")
    require(bits > 0 && n * bits <= 62, s"dims*bits must be in (0, 62]: $n*$bits")
    df.withColumn(outCol,
      org.apache.spark.sql.GraftColumnBridge.column(HilbertNExpr(
        coords.map(c => org.apache.spark.sql.GraftColumnBridge.expression(
          c.cast("long"))), bits)))
  }

  /** SQL (DuckDB) replay of [[withHilbertN]]: the same per-(level, dim)
    * unroll as nested selects.
    */
  def hilbertNSql(from: String, keys: Seq[String], coordExprs: Seq[String],
                  bits: Int, outCol: String): String = {
    val n = coordExprs.size
    require(n >= 2 && bits > 0 && n * bits <= 62)
    val ks = keys.mkString(", ")
    val hs = (0 until n).map(i => s"h$i")
    var inner = s"SELECT $ks, " + coordExprs.zipWithIndex.map { case (e, i) =>
      s"CAST($e AS BIGINT) AS h$i"
    }.mkString(", ") + s" FROM $from"
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        val others = hs.filter(c => c != "h0" && c != s"h$i")
        val keep = if (others.nonEmpty) others.mkString(", ", ", ", "") else ""
        val hiOut = if (i == 0) ""
        else s", CASE WHEN (h$i & $q) <> 0 THEN h$i ELSE xor(h$i, ht) END AS h$i"
        inner =
          s"""SELECT $ks,
             |  CASE WHEN (h$i & $q) <> 0 THEN xor(h0, $p) ELSE xor(h0, ht) END AS h0$hiOut$keep
             |FROM (SELECT $ks, ${hs.mkString(", ")}, (xor(h0, h$i) & $p) AS ht FROM ($inner))""".stripMargin
        i += 1
      }
      q >>= 1
    }
    val grayCols = (0 until n).map(i =>
      (0 to i).map(j => s"h$j").reduce((a, b) => s"xor($a, $b)") + s" AS h$i")
    inner = s"SELECT $ks, ${grayCols.mkString(", ")} FROM ($inner)"
    val tExpr = {
      var t = "CAST(0 AS BIGINT)"
      var qq = 1L << (bits - 1)
      while (qq > 1) {
        t = s"xor($t, CASE WHEN (h${n - 1} & $qq) <> 0 THEN ${qq - 1} ELSE 0 END)"
        qq >>= 1
      }
      t
    }
    inner = s"SELECT $ks, ${hs.mkString(", ")}, $tExpr AS ht FROM ($inner)"
    inner = s"SELECT $ks, " +
      (0 until n).map(i => s"xor(h$i, ht) AS h$i").mkString(", ") + s" FROM ($inner)"
    val interleave = (for {
      j <- 0 until bits
      k <- 0 until n
    } yield s"((h$k >> $j) & 1) * ${1L << (j * n + (n - 1 - k))}")
      .mkString("(", " + ", ")")
    s"SELECT $ks, $interleave AS $outCol FROM ($inner)"
  }

  /** Driver-side reference of the n-D walk — spec parity and tooling. */
  def hilbertIndexN(coords0: Seq[Long], bits: Int): Long = {
    val n = coords0.length
    val x = coords0.toArray
    val m = 1L << (bits - 1)
    var q = m
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = m
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
    var out = 0L
    var j = 0
    while (j < bits) {
      var k = 0
      while (k < n) {
        out |= ((x(k) >> j) & 1L) << (j * n + (n - 1 - k))
        k += 1
      }
      j += 1
    }
    out
  }

  /** Range-partition and sort along the n-D curve — the write-side
    * clustering step, one range exchange.
    */
  def clusterByHilbertN(df: DataFrame, coords: Seq[Column], bits: Int,
                        numPartitions: Int): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    withHilbertN(df, coords, bits, "__hv")
      .repartitionByRange(numPartitions, col("__hv"))
      .sortWithinPartitions(col("__hv"))
      .drop("__hv")
  }
}

/** The Skilling walk as one native per-row loop ([[Hilbert.hilbertIndexN]]
  * semantics exactly; null if any coordinate is null).
  */
case class HilbertNExpr(children: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                        bits: Int)
  extends org.apache.spark.sql.catalyst.expressions.Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(children.size >= 2 && bits > 0 && children.size * bits <= 62)

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val n = children.size
    val coords = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      coords(i) = v.asInstanceOf[Long]
      i += 1
    }
    java.lang.Long.valueOf(
      Hilbert.hilbertIndexN(scala.collection.immutable.ArraySeq.unsafeWrapArray(coords), bits))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression]): HilbertNExpr =
    copy(children = newChildren)
}
