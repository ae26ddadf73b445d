package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column a backend-agnostic wrapper and moved the
  * Column↔Expression bridge behind `private[sql]` (classic.
  * ExpressionUtils). Libraries adding native Catalyst expressions need
  * exactly these two calls, so we expose them from inside the sql
  * package — the same pattern other open-source Spark extension
  * libraries use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
