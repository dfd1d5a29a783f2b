package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression with real
  * `doGenCode`: the normalize call is emitted inline into the generated
  * code, so it rides whole-stage codegen like a built-in (no UDF
  * serialization, no interpreted-lambda fallback). Spark itself has no
  * normalization function; a Scala UDF would break the codegen span of
  * every pipeline that normalizes before deduplication — exactly the hot
  * path at corpus scale.
  */
object NormalizeExpressions {

  /** `form` is an ICU/JDK normalization form name: NFC, NFD, NFKC, NFKD. */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    GraftColumnBridge.column(
      NormalizeUnicodeExpr(GraftColumnBridge.expression(c), form))
}

case class NormalizeUnicodeExpr(child: Expression, form: String)
    extends UnaryExpression {

  // Validated in the case class, not the builder: a tree transform or
  // future call site constructing the node directly must fail at plan
  // time, never as a codegen javac error (the form name is interpolated
  // into generated source below).
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form), s"unknown form: $form")

  @transient private lazy val jform = java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, jform))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
