package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column<->Expression converters so graft
  * can expose custom Catalyst expressions (e.g. SimHash64) as Columns.
  * Lives in the org.apache.spark.sql package by design — the standard
  * technique for Spark-native extension libraries on Spark 4.x, where
  * Column is backed by ColumnNode and no public converter exists. */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
