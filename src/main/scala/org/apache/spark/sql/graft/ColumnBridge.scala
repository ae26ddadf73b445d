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

  /** True when `df`'s normalized plan is already in the session cache —
    * the exact predicate CacheManager.cacheQuery uses before logging
    * "Asked to cache already cached data". Lets [[graft.CacheScope]]
    * make persist() idempotent: operators compose (an LM scorer caches
    * the model frame a pipeline already cached) and a second persist of
    * the same plan is a WARN plus wasted analysis, never a second copy. */
  def isCached(df: org.apache.spark.sql.DataFrame): Boolean = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    ds.sparkSession.sharedState.cacheManager
      .lookupCachedData(ds).isDefined
  }

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
