package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` helpers of the classic Spark API so graft's
 * custom Catalyst expressions can surface as user-facing `Column`s.
 * (Spark 4.x made Column a ColumnNode wrapper; the classic converter lives
 * in org.apache.spark.sql.classic.) */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
