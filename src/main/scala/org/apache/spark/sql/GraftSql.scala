package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and Catalyst Expressions.
  * Spark 4 made Column opaque (ColumnNode-backed); the conversions live in
  * `classic.ExpressionUtils` but are `private[sql]` — this shim re-exports
  * them for graft's custom expressions. */
object GraftSql {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
