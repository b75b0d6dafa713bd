package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression and LogicalPlan → DataFrame bridges. Spark 4 made
  * these conversions `private[sql]` (columnNodeSupport.scala,
  * classic.Dataset.ofRows); extension libraries that define native Catalyst
  * expressions/operators need this one-hop shim — the same pattern Spark
  * connector projects use. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** FULL ColumnNode→Expression conversion (recursive — no lazy
    * `ColumnNodeExpression` stubs left in the tree). Required wherever a
    * Column composition must become a standalone catalyst expression
    * OUTSIDE a Dataset operation — e.g. a FunctionRegistry builder: the
    * lazy stubs report NullType until converted, so a higher-order
    * function's lambda body would fail analysis inside `spark.sql`. */
  def expressionConverted(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan
}
