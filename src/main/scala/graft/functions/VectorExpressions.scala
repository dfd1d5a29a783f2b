package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over `array<float>`/`array<double>` embedding columns.
  *
  * The built-in formulation (`aggregate(zip_with(...))`) is correct but every
  * element crosses the higher-order-function interpreter; this expression is
  * one tight JVM loop per row — the difference between an ANN scan being
  * CPU-bound on lambda dispatch vs memory-bound on the embeddings themselves.
  * Bit-for-bit equal to the built-in left-fold (same accumulation order),
  * pinned by FunctionsSpec.
  */
object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProductExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemGetter(e: Expression): (ArrayData, Int) => Double =
    e.dataType match {
      case ArrayType(FloatType, _)  => (arr, i) => arr.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (arr, i) => arr.getDouble(i)
      case other => throw new IllegalArgumentException(
        s"DotProductExpr expects array<float|double>, got $other")
    }

  @transient private lazy val getLeft = elemGetter(left)
  @transient private lazy val getRight = elemGetter(right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += getLeft(a, i) * getRight(b, i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
