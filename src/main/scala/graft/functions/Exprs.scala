package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge. Spark 4 moved `Column.expr`
  * behind `private[sql]` classic API, so this lives in an
  * org.apache.spark.sql subpackage — the one deliberate (and
  * conventional) package-visibility escape hatch in this library. */
object Exprs {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
