package org.apache.spark.sql.graftops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset factory so the engine can expose
  * DataFrames over its own logical plan nodes (same pattern every Spark
  * extension library uses for custom operators).
  */
object PlanUtils {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap a Catalyst expression as a user-facing Column (the inverse of
    * [[expressionOf]]) — needed when an expression has no SQL-callable
    * registration or takes non-SQL-encodable arguments (e.g. a binary
    * Bloom-filter literal).
    */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Extract the Catalyst expression backing a Column. */
  def expressionOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
