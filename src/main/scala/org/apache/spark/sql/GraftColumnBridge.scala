package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters so graft
  * can expose custom Catalyst expressions as user-facing Columns (the
  * supported route, `SparkSessionExtensions.injectFunction`, forces a
  * session-bound registry; a direct wrap keeps the kernels usable as plain
  * `functions._`-style combinators).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
