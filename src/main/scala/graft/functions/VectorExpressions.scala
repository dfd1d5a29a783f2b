package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over `array<float>`/`array<double>` embedding columns.
  *
  * The built-in formulation (`aggregate(zip_with(...))`) is correct but every
  * element crosses the higher-order-function interpreter; this expression is
  * one tight JVM loop per row — the difference between an ANN scan being
  * CPU-bound on lambda dispatch vs memory-bound on the embeddings themselves.
  * Participates in whole-stage codegen (doGenCode emits the same loop), so a
  * scoring stage containing it stays a single generated function.
  * Bit-for-bit equal to the built-in left-fold (same accumulation order),
  * pinned by FunctionsSpec.
  */
object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProductExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemGetter(e: Expression): (ArrayData, Int) => Double =
    e.dataType match {
      case ArrayType(FloatType, _)  => (arr, i) => arr.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (arr, i) => arr.getDouble(i)
      case other => throw new IllegalArgumentException(
        s"DotProductExpr expects array<float|double>, got $other")
    }

  private def elemGetterCode(e: Expression): (String, String) => String =
    e.dataType match {
      case ArrayType(FloatType, _)  => (arr, i) => s"(double) $arr.getFloat($i)"
      case ArrayType(DoubleType, _) => (arr, i) => s"$arr.getDouble($i)"
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gl = elemGetterCode(left)
    val gr = elemGetterCode(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${gl(a, i)} * ${gr(b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
