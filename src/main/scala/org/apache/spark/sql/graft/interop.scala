package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Interop shim: `Column ⇄ Expression` bridging lives behind
 * `private[sql]` in Spark 4 (columns wrap ColumnNodes, not Expressions).
 * This object re-exports the two conversions the engine's custom
 * expressions need. Kept deliberately minimal — nothing else from
 * Spark internals is re-exported.
 */
object interop {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
