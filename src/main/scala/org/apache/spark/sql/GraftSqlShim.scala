package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` door the engine needs: constructing a
  * DataFrame from a custom logical plan (`Dataset.ofRows`). Everything
  * else in graft.* uses public APIs; this shim exists so the custom
  * operator nodes (graft.plans) can enter a query without reflection.
  * Standard technique for plan-level Spark extensions. */
object GraftSqlShim {
  def ofRows(spark: classic.SparkSession, plan: LogicalPlan): classic.DataFrame =
    classic.Dataset.ofRows(spark, plan)

  def expression(col: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(col)

  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
