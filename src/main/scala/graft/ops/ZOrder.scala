package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout — the
  * technique lakehouse writers use so that files clustered on the curve
  * have tight min/max ranges on EVERY interleaved column, letting scans
  * filtered on any of them skip most files. Sorting on (a, b) gives
  * perfect pruning on `a` and none on `b`; sorting on z(a, b) gives good
  * pruning on both (quantified in ZOrderSpec).
  *
  * The z-value interleaves the low `bits` bits of each column: bit i of
  * column k lands at position i·ncols + k. Expressed as a sum of
  * `((x >> i) & 1) * 2^pos` terms — multiplications by literal powers of
  * two rather than left shifts, because left shifts overflow-error in
  * DuckDB and this expression is replayed verbatim by the oracle
  * ([[graft.functions.PortableHash]] precedent). Inputs must lie in
  * [0, 2^bits); `ncols·bits` must stay ≤ 62 so the sum fits a long.
  */
object ZOrder {

  /** Morton code of `cols` (each a non-negative integral column), using
    * the low `bits` bits of each.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "at least one column")
    require(bits > 0 && cols.size * bits <= 62,
      s"ncols*bits must be in (0, 62]: ${cols.size}*$bits")
    val terms = for {
      i <- 0 until bits
      (c, k) <- cols.zipWithIndex
    } yield shiftright(c.cast("long"), i).bitwiseAND(lit(1L)) *
      lit(1L << (i * cols.size + k))
    terms.reduce(_ + _)
  }

  /** SQL (DuckDB) expression replaying [[zValue]] exactly. */
  def zValueSql(exprs: Seq[String], bits: Int): String = {
    val terms = for {
      i <- 0 until bits
      (e, k) <- exprs.zipWithIndex
    } yield s"((($e) >> $i) & 1) * ${1L << (i * exprs.size + k)}"
    terms.mkString("(", " + ", ")")
  }

  /** Range-partition and sort the frame along the z-curve of `cols` —
    * the write-side clustering step (pair with a partitioned/bucketed
    * sink). One range exchange, same cost as any global sort.
    */
  def clusterByZ(df: DataFrame, cols: Seq[Column], bits: Int,
                 numPartitions: Int): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    df.withColumn("__z", zValue(cols, bits))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
