package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4 moved
  * the Expression-backed Column constructor behind
  * org.apache.spark.sql.classic.ExpressionUtils). Needed to expose custom
  * Catalyst expressions (graft.functions.*) through the Column API.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions' injected functions to an existing
    * session's registry (what SparkSession.builder does at build time;
    * `registerFunctions` is private[sql]).
    */
  def registerExtensionFunctions(ext: SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    ext.registerFunctions(registry)

  /** DataFrame from a custom LogicalPlan (Dataset.ofRows is private[sql]) —
    * the construction path for custom logical operators like
    * graft.plans.SkylineNode.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
