package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access shim: Spark 4 wraps Column around ColumnNode and keeps the
  * Expression↔Column converters `private[sql]`. Custom native expressions
  * (graft.functions.HexPrefixToLong) need exactly these two calls, so this
  * object re-exports them from inside the `org.apache.spark.sql` namespace —
  * the conventional pattern for third-party Catalyst extensions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
