package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark 4's `private[sql]` Column<->Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`) for our native
  * Catalyst expressions — the same package-placement escape hatch
  * third-party Spark libraries use to expose custom expressions as
  * `Column`s on Spark 4's ColumnNode-based API.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (custom) LogicalPlan into a DataFrame — the front door for
    * whole-operator extensions (`graft.plans`), mirroring what
    * `Dataset.ofRows` does for Spark's own relational operators.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
