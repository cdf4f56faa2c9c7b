package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge into Spark's `private[sql]` Column ↔ Expression
 * converters (Spark 4 wraps Column around ColumnNode; the classic
 * converters live behind package-private access). Standard extension
 * practice: one tiny object in the `org.apache.spark.sql` package, no
 * behavior of its own.
 */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
