package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversion
  * (Spark 4 routes Column through ColumnNode; the classic converters
  * live behind a package-private API). Standard extension-library
  * pattern: a shim compiled into the `org.apache.spark.sql` namespace
  * so graft's native Catalyst expressions can surface as Columns. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
