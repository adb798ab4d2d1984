package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 wraps `Column` around a `ColumnNode`; the Expression bridge is
  * `private[sql]`. Libraries defining native Catalyst expressions use a
  * same-package accessor — the standard pattern for Spark extension
  * libraries (the alternative, registering every expression as a SQL temp
  * function, loses the typed Column API).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
