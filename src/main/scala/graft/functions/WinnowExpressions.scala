package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The winnowing window selection (Schleimer, Wilkerson & Aiken 2003) as
  * a native Catalyst expression: given a document's k-gram hash array,
  * return the DISTINCT selected fingerprints — each w-window's minimum
  * hash, ties to the RIGHTMOST position.
  *
  * Why native: the HOF formulation ([[graft.operators.Winnowing
  * .fingerprintsHof]], kept as the pinned parity reference) folds every
  * window with an interpreted `aggregate` lambda — O(n·w) per document
  * with per-element lambda dispatch and a struct allocation per step
  * (higher-order-function lambdas are never codegen'd; the q175 sign-
  * matrix lesson). This expression runs ONE compiled O(n) pass with the
  * classic monotonic-deque sliding-window minimum, emitted into the
  * generated code as a single static call.
  *
  * Rightmost-tie parity detail the O(n) pass relies on: a position, once
  * superseded as a window's winner, is never selected by a LATER window
  * (the superseding element has a ≤ hash at a later position and stays
  * in every remaining window that still contains the old winner), so
  * each position's selections form one consecutive window run — emitting
  * only on winner CHANGE reproduces `array_distinct` over the per-window
  * winners exactly, in first-occurrence order.
  */
object WinnowExpressions {

  /** `hashes`: array<long> of k-gram hashes; returns
    * array<struct<fp:long,pos:long>> of the distinct selected
    * fingerprints (empty if fewer than w grams).
    */
  def winnowSelect(hashes: Column, w: Int): Column =
    GraftColumnBridge.column(
      WinnowSelectExpr(GraftColumnBridge.expression(hashes), w))
}

/** Static worker called from both interpreted eval and generated code. */
object WinnowSelect {

  def select(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    // Deque of positions with strictly increasing hash values; `>=` on
    // insertion pops equal earlier positions — the rightmost-tie rule.
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    val out = new scala.collection.mutable.ArrayBuffer[Any](2 * n / (w + 1) + 4)
    var lastPos = -1
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      while (tail > head && hs.getLong(dq(tail - 1)) >= h) tail -= 1
      dq(tail) = i
      tail += 1
      val s = i - w + 1
      if (s >= 0) {
        while (dq(head) < s) head += 1
        val p = dq(head)
        if (p != lastPos) {
          out += new GenericInternalRow(Array[Any](hs.getLong(p), p.toLong))
          lastPos = p
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class WinnowSelectExpr(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 1, s"window width must be >= 1, got $w")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_select needs array<bigint>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp", LongType, nullable = false),
      StructField("pos", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WinnowSelect.select(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowSelect.select($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
