package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Space-Saving summary buffer: `counters` maps token →
  * [est, err]; `delta` bounds the true count of every UNTRACKED token.
  *
  * Invariants (the Metwally 2005 guarantees, kept through merges by the
  * Agarwal 2013 mergeable-summaries discipline; spec-pinned):
  *   - est − err ≤ true ≤ est for every tracked token;
  *   - true ≤ delta for every untracked token;
  *   - counters.size ≤ m.
  */
final class SpaceSavingBuffer(val m: Int) {
  var delta: Long = 0L
  val counters = new java.util.HashMap[String, Array[Long]]()

  /** One occurrence: increment, insert, or evict-the-min (classic SS).
    * The min scan is O(m) per EVICTION only — the textbook
    * Stream-Summary structure makes it O(1); at the m ≲ few-thousand
    * summaries this engine sizes, the scan is cheaper than the pointer
    * churn (and the eviction path only runs once the summary is full).
    */
  def add(token: String): Unit = {
    val cur = counters.get(token)
    if (cur != null) { cur(0) += 1L; return }
    if (counters.size < m) {
      counters.put(token, Array(1L, 0L))
      return
    }
    // evict the minimum-estimate entry; ties break to the LEXICALLY
    // SMALLEST token so a replay of the same sequence evicts identically
    var minTok: String = null
    var minEst = Long.MaxValue
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val est = e.getValue()(0)
      if (est < minEst || (est == minEst && (minTok == null || e.getKey < minTok))) {
        minEst = est; minTok = e.getKey
      }
    }
    counters.remove(minTok)
    if (minEst > delta) delta = minEst
    // the newcomer inherits the evicted slot's mass as its error
    counters.put(token, Array(minEst + 1L, minEst))
  }

  /** Fold `other` in: absent keys contribute the absent side's delta to
    * both est and err (an untracked token may have had up to delta true
    * occurrences there), then truncate back to the top m by (est desc,
    * token asc) with every cut entry's est folded into delta.
    */
  def merge(other: SpaceSavingBuffer): Unit = {
    val selfDelta = delta
    val it = counters.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val o = other.counters.get(e.getKey)
      if (o != null) { e.getValue()(0) += o(0); e.getValue()(1) += o(1) }
      else { e.getValue()(0) += other.delta; e.getValue()(1) += other.delta }
    }
    val oit = other.counters.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      if (!counters.containsKey(e.getKey)) {
        counters.put(e.getKey,
          Array(e.getValue()(0) + selfDelta, e.getValue()(1) + selfDelta))
      }
    }
    delta += other.delta
    if (counters.size > m) {
      val all = sortedEntries
      var i = m
      while (i < all.length) {
        val est = all(i)._2(0)
        if (est > delta) delta = est
        counters.remove(all(i)._1)
        i += 1
      }
    }
  }

  /** Entries by (est desc, token asc) — the deterministic summary order. */
  def sortedEntries: Array[(String, Array[Long])] = {
    val arr = new Array[(String, Array[Long])](counters.size)
    val it = counters.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); arr(i) = e.getKey -> e.getValue; i += 1 }
    arr.sortBy { case (tok, v) => (-v(0), tok) }
  }
}

/** The Space-Saving build as ONE native aggregate: each map task folds
  * its occurrences into a local [[SpaceSavingBuffer]] and the exchange
  * carries one ≤ m-entry buffer per task regardless of corpus size (the
  * [[CmsSketchAgg]] contract). Null tokens are skipped (aggregate-count
  * semantics). Output: struct(delta, entries array<struct<token, est_n,
  * err_n>> by est desc, token asc).
  */
case class SpaceSavingAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] with UnaryLike[Expression] {

  require(m > 0, "m must be positive")

  override def prettyName: String = "space_saving"
  override def nullable: Boolean = false
  override def dataType: DataType = SpaceSavingAgg.outputType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"space_saving expects a string token column, got ${t.simpleString}")
    }
  }

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(m)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val entries = buf.sortedEntries.map { case (tok, v) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(tok), v(0), v(1)))
    }
    new GenericInternalRow(Array[Any](buf.delta,
      new GenericArrayData(entries.asInstanceOf[Array[Any]])))
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val entries = buf.sortedEntries.map { case (tok, v) =>
      (tok.getBytes(StandardCharsets.UTF_8), v(0), v(1))
    }
    val size = 4 + 8 + 4 + entries.map(e => 4 + e._1.length + 16).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.m)
    bb.putLong(buf.delta)
    bb.putInt(entries.length)
    entries.foreach { case (tb, est, err) =>
      bb.putInt(tb.length); bb.put(tb); bb.putLong(est); bb.putLong(err)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new SpaceSavingBuffer(bb.getInt)
    buf.delta = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val tb = new Array[Byte](bb.getInt)
      bb.get(tb)
      buf.counters.put(new String(tb, StandardCharsets.UTF_8),
        Array(bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingAgg =
    copy(child = newChild)
}

object SpaceSavingAgg {
  val outputType: StructType = StructType(Seq(
    StructField("delta", LongType, nullable = false),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est_n", LongType, nullable = false),
      StructField("err_n", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  /** `space_saving(token, m)` as a Column aggregate. */
  def summary(token: Column, m: Int): Column =
    GraftColumnBridge.column(
      SpaceSavingAgg(GraftColumnBridge.expression(token), m)
        .toAggregateExpression())
}
