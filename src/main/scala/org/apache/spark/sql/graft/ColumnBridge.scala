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

  /** Deep conversion through the session converter: unlike
    * [[expression]] (which wraps unresolved ColumnNodes in an opaque,
    * Unevaluable ColumnNodeExpression), this lowers a COMPOSED Column
    * tree (functions._ calls, lambdas) into genuine catalyst
    * UnresolvedFunction/LambdaFunction nodes the analyzer then
    * resolves — required when splicing composed Columns into an
    * injected SQL function's expression tree. */
  def analyzableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
