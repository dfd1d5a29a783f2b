package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native count-min sketch BUILD as one aggregate — the production path
  * for [[graft.operators.CountMin]]'s xxhash64 family.
  *
  * The composed formulation ([[graft.operators.CountMin.sketchFast]])
  * explodes `depth` (j, bucket) rows per token before its map-side
  * combine: a depth-× row amplification materialized per input row just
  * to be re-collapsed by the partial aggregate. This aggregate instead
  * folds each token straight into a `depth`·`width` long-array buffer —
  * zero per-row allocation, no amplification — and the exchange carries
  * ONE buffer per map task (depth·width·8 bytes, e.g. 32 KiB at 4×1024)
  * regardless of corpus size. Merge is cell-wise addition (CMS
  * linearity, same law [[graft.operators.CountMin.merge]] pins).
  *
  * Bucket parity with `sketchFast` is EXACT and spec-pinned
  * (CountMinSpec): bucket(j) replays `pmod(xxhash64(token, j), width)`
  * by chaining [[XxHash64Function]] exactly as the builtin does —
  * seed 42, token hashed first (skipped when null, like the builtin,
  * so a null token still lands in row j's hash-of-j bucket), then j as
  * a long.
  *
  * Output: the flat cell array (row-major, cell j·width+b = count of
  * (j, b)) — [[graft.operators.CountMin.sketchAgg]] explodes the ≤
  * depth·width non-zero cells back to the operator's (j, bucket, cnt)
  * table so estimate/merge/spec tooling is shared across build paths.
  */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth > 0, "depth must be positive")
  require(width > 0, "width must be positive")

  override def prettyName: String = "cms_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    var j = 0
    while (j < depth) {
      // exact replay of pmod(xxhash64(token, lit(j)), width): seed 42,
      // null inputs skipped (seed passes through), left-to-right chain
      var h = 42L
      if (v != null) h = XxHash64Function.hash(v, child.dataType, h)
      // lit(j) in bucketOfFast is an INT literal: must hash as IntegerType
      // (xxhash64's int and long paths produce different values)
      h = XxHash64Function.hash(j, IntegerType, h)
      val m = h % width
      val bucket = (if (m < 0) m + width else m).toInt
      buf(j * width + bucket) += 1L
      j += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

object CmsSketchAgg {
  /** `cms_sketch(token)` as a Column aggregate. */
  def cells(token: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CmsSketchAgg(GraftColumnBridge.expression(token), depth, width)
        .toAggregateExpression())
}
