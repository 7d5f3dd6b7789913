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

  /** Apply a built `SparkSessionExtensions`' injected functions to a LIVE
    * session's registry (`registerFunctions` is `private[sql]`). Lets the
    * test suite exercise the exact extension object production passes via
    * `spark.sql.extensions` — a config-created session is not reachable
    * once a shared test session exists. */
  def registerInjectedFunctions(ext: SparkSessionExtensions, session: SparkSession): Unit =
    ext.registerFunctions(session.sessionState.functionRegistry)
}
