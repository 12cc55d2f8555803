package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one necessary bridge into Spark's private[sql] surface: turning
  * a custom LogicalPlan into a user-facing DataFrame requires
  * `Dataset.ofRows`, which Spark does not expose publicly. Every
  * connector that adds whole-plan operators ships this same three-line
  * shim; nothing else in graft lives outside the public API. */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** EAGER Column → catalyst Expression via the session's converter.
    * (ExpressionUtils.expression defers behind a ColumnNodeExpression
    * proxy whose internal node is not serializable — fine inside
    * Spark's own operators, fatal when captured by a custom physical
    * node's task closure.) */
  def expression(spark: SparkSession,
                 c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)
}
