package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column ↔ Expression converters (Spark 4
  * wraps Columns around ColumnNodes; classic.ExpressionUtils is
  * private[sql]). Lives in the org.apache.spark.sql package solely to
  * expose the two conversions our native expressions need.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
