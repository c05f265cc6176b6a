package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge. `classic.ExpressionUtils` is
  * `private[sql]`, so third-party engines that build native expressions
  * (e.g. [[graft.functions.CosineSimilarity]]) need this one-hop accessor
  * inside the sql namespace — the conventional extension-library pattern.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Convert eagerly to a plain catalyst tree (`UnresolvedFunction` etc.)
    * instead of the lazy `ColumnNodeExpression` wrapper [[expression]]
    * yields. Required when the expression is returned from an
    * `injectFunction` builder: the analyzer resolves nested unresolved
    * functions in its normal fixpoint, but never looks inside a
    * ColumnNode wrapper (it reaches codegen Unevaluable). */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap an execution-time `RDD[InternalRow]` back into a DataFrame so a
    * physical operator can run a DataFrame-expressed pipeline over its
    * child's output (`internalCreateDataFrame` is `private[sql]`). */
  def internalFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
