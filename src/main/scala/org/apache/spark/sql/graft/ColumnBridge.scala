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

  /** A session on the same SparkContext with NO SparkSessionExtensions and
    * a fresh SessionState — the shape a foreign application's session has
    * before `graft.Graft.ensure` retrofits the engine. Test-only surface:
    * `newSession()` inherits the parent's extensions object, so an
    * extensions-built test harness cannot otherwise produce the bare
    * session the imperative attachment path must be audited against (the
    * classic constructor is `private[sql]`). Shares the parent's
    * SharedState (one metastore per JVM); session state, confs, temp views
    * start fresh.
    */
  def bareSession(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession = {
    val c = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // The `private[sql]` this(sc) constructor re-loads extensions from the
    // context conf (applyAndLoadExtensions), so in an extensions-built JVM
    // it is NOT bare; the primary constructor takes the extensions object
    // explicitly but is class-private — reflection (Scala `private` is
    // public at the bytecode level) is the only way to hand it an empty one.
    val ctor = classOf[org.apache.spark.sql.classic.SparkSession]
      .getDeclaredConstructors.find(_.getParameterCount == 6)
      .getOrElse(sys.error("classic.SparkSession primary constructor not found"))
    ctor.newInstance(c.sparkContext, Some(c.sharedState), None,
        new org.apache.spark.sql.SparkSessionExtensions,
        Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[org.apache.spark.sql.SparkSession]
  }

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
