package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the classic Column ⇄ Catalyst-Expression converters, which
  * are `private[sql]` in Spark 4.x. This is the conventional extension
  * point for libraries that ship custom Catalyst expressions without a
  * SessionExtensions registration step. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
