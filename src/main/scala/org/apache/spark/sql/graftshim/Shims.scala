package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal `private[sql]` escape hatch — the standard connector shim
 * pattern (Delta's `org.apache.spark.sql.delta`, Iceberg's
 * `org.apache.spark.sql.catalyst.*` helpers live the same way). One
 * accessor, nothing else: wrap a Catalyst Expression as a user-facing
 * Column so planner rules can hand conditions back to public DataFrame
 * surfaces ([[graft.store.Snapshots.countWhere]]).
 */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  /** The inverse accessor, for expressions that take Column arguments
    * outside the FunctionRegistry path ([[graft.expr.CappedCollectList]]). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
