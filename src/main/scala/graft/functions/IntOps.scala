package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.IntegralDivide

/** Exact integer arithmetic helpers. `Column./` is IEEE double division —
  * a round-trip through double loses exactness past 2^53 — so quotients
  * that feed bucket/offset math go through Catalyst's `IntegralDivide`
  * instead (the SQL `div` operator, codegen'd).
  */
object IntOps {

  /** `a div b` for NON-NEGATIVE a (b > 0): IntegralDivide truncates toward
    * zero, which equals floor-division only when the numerator is
    * non-negative — callers with possibly-negative numerators must clamp
    * first (or see [[graft.ops.RangeJoin]] for the sign-correct pmod form).
    */
  def intDiv(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntegralDivide(
      GraftColumnBridge.expression(a.cast("long")),
      GraftColumnBridge.expression(b.cast("long"))))
}
