package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column <-> catalyst Expression conversion
  * (Spark 4 moved Column onto ColumnNode; `classic.ExpressionUtils` is
  * `private[sql]`). Lives in the org.apache.spark.sql package purely to
  * re-export the two conversions for graft's native expressions. */
object GraftColumnBridge {
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}
