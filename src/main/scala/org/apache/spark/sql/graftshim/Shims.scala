package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

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

  /** Flag a batch frame's file relation leaves as STREAMING — what a V1
    * streaming [[org.apache.spark.sql.execution.streaming.Source]]'s
    * `getBatch` contract requires (the engine asserts
    * `isStreaming=true` on the returned plan), done exactly the way
    * FileStreamSource does it: `LogicalRelation(isStreaming = true)`.
    * The relation stays a normal file scan, so Catalyst still prunes
    * columns, pushes filters, and vectorizes the parquet read — the
    * point of serving streams through the V1 surface. Callers must hand
    * in single-relation plans (a flipped multi-leaf join would read as a
    * stream-stream join to the incremental planner). */
  def streamingFrame(df: DataFrame): DataFrame = {
    // the ANALYZED plan: `spark.read.parquet` parks behind an
    // UnresolvedDataSource until analysis resolves the file relation
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation => lr.copy(isStreaming = true)
    }
    Dataset.ofRows(df.sparkSession.asInstanceOf[classic.SparkSession], plan)
  }

  /** An empty STREAMING frame of `schema` — the V1 `getBatch` result for
    * a range that added no files (a schema-op-only commit). */
  def emptyStreamingFrame(spark: SparkSession, schema: StructType): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      cs.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
      schema, isStreaming = true)
  }
}
