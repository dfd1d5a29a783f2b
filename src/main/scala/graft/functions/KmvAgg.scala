package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable KMV (k-minimum-values / bottom-k theta) buffer: the k SMALLEST
  * distinct hash values seen. Beyer et al. 2007 / theta-sketch family —
  * the distinct-count sketch whose states COMPOSE under set algebra
  * (union = merge, intersection via the min-theta rule), which HLL
  * registers cannot do for intersections.
  *
  * Determinism: the k smallest distinct values of a multiset are a pure
  * function of the value SET — independent of arrival order, partitioning,
  * and merge-tree shape — so downstream estimates are exactly replayable
  * by any engine that sorts the same hashes.
  */
final class KmvBuffer(val k: Int) {
  val mins = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit = {
    if (mins.size < k) { mins.add(h); () }
    else if (h < mins.last()) {
      if (mins.add(h)) { mins.remove(mins.last()); () }
    }
  }

  def merge(other: KmvBuffer): Unit = {
    val it = other.mins.iterator()
    while (it.hasNext) add(it.next())
  }
}

/** The KMV build as ONE native aggregate: each map task keeps a k-entry
  * tree of its smallest distinct hashes and the exchange carries ≤ k
  * longs per task regardless of input size (the [[CmsSketchAgg]] /
  * [[SpaceSavingAgg]] sketch-sized-exchange contract — the pure-SQL
  * formulation would shuffle every distinct hash and sort per group,
  * which is the exact-distinct cost the sketch exists to avoid).
  * Input: a long hash column (hash upstream with the portable
  * [[PortableHash]] 60-bit family so oracles replay). Nulls skipped.
  * Output: array<long> ascending — the k smallest distinct hashes.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 1, "k must be at least 2 (the estimator divides by k-1)")

  override def prettyName: String = "kmv_minima"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"kmv_minima expects a long hash column, got ${t.simpleString}")
    }
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val arr = new Array[Any](buf.mins.size)
    val it = buf.mins.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.mins.size)
    bb.putInt(buf.k)
    bb.putInt(buf.mins.size)
    val it = buf.mins.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.mins.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object KmvAgg {
  /** `kmv_minima(hash, k)` as a Column aggregate. */
  def minima(hash: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvAgg(GraftColumnBridge.expression(hash), k).toAggregateExpression())
}
