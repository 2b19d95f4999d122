package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression converters
  * (Spark 4 wraps Column around ColumnNode; the classic converter lives
  * behind `org.apache.spark.sql.classic.ExpressionUtils`). Placing this
  * object inside the sql package is the standard extension-library
  * technique for registering custom Catalyst expressions as Columns.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
