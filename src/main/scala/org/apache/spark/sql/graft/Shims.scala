/*
 * Bridge between Catalyst Expressions and the public Column API.
 *
 * Spark 4.x split `Column` from Catalyst (`Column` wraps a `ColumnNode`,
 * not an `Expression`). The conversion helpers live in
 * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`,
 * so this one file sits inside the `org.apache.spark.sql` package tree to
 * re-export the two conversions the graft library needs. No Spark
 * internals are modified.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object Shims {
  /** Wrap a Catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst Expression backing a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a LogicalPlan (`Dataset.ofRows` is
    * `private[sql]`) — needed to hand a custom logical operator to the
    * planner. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
