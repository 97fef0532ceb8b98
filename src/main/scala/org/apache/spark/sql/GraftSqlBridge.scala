package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the private[sql] Column ⇄ Expression conversions — the
  * standard pattern for libraries contributing native Catalyst
  * expressions (Spark 4 removed the public `Column.expr` accessor in
  * favor of Connect-agnostic column nodes; on the classic engine
  * ExpressionUtils is the sanctioned converter). Kept to exactly these
  * calls so the private-API surface we touch stays minimal; `ofRows`
  * exists for the optimizer-rule differential tests (run a hand-applied
  * rewritten plan without rebuilding a session). */
object GraftSqlBridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
