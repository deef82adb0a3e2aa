package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` helpers so graft can wrap native Catalyst
  * [[Expression]]s as user-facing [[Column]]s (Spark 4 removed the public
  * `new Column(expr)` constructor). Classic (non-Connect) backend only.
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function on an ALREADY-RUNNING session — the test/REPL
    * path; production sessions get the same builders at construction via
    * `spark.sql.extensions=graft.GraftExtensions`.
    */
  def registerFunction(
      spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder): Unit
  }
}
