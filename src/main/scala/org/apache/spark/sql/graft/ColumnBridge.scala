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
}
