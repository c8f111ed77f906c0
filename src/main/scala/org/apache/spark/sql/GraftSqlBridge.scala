package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-private-API bridge: materialize a DataFrame from a
  * Catalyst logical plan. `Dataset.ofRows` is `private[sql]`, so this
  * one-liner lives in the `org.apache.spark.sql` package — the
  * conventional extension-library shim (Delta, Iceberg and friends do
  * the same). Used by graft's SQL DML front-end to evaluate a parsed
  * MERGE/INSERT source subplan against the session. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ⇄ Expression converters (`ExpressionUtils` is
    * `private[sql]`): the one way to use a custom Expression that a
    * FunctionBuilder cannot construct — e.g. one carrying a Broadcast
    * handle, which is session state, not a child Expression. */
  def columnOf(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
