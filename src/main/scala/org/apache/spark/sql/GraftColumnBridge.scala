package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression conversions of Spark 4's
  * classic API, needed to expose custom Catalyst expressions as `Column`s
  * (the public `new Column(expr)` constructor was removed in Spark 4).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
