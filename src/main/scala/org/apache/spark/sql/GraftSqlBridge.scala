package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column<->Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`) for our native
  * Catalyst expressions — the same package-placement escape hatch
  * third-party Spark libraries use to expose custom expressions as
  * `Column`s on Spark 4's ColumnNode-based API.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
