package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters
  * (Spark 4 wraps Column around ColumnNode; the classic converter
  * lives behind package-private access). Standard extension-library
  * pattern — same approach as public Spark extension projects.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build the AggregateExpression for a typed Aggregator over the
    * given child expressions — what `functions.udaf(...)(cols)` does,
    * but usable inside a FunctionRegistry builder where only
    * Expressions exist (a Column detour leaves an unresolved
    * ColumnNodeExpression behind).
    */
  def aggregatorExpression[IN, BUF, OUT](
      agg: org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT],
      inputEncoder: org.apache.spark.sql.Encoder[IN],
      children: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.encoders.{AgnosticEncoder, ExpressionEncoder}
    def toExpr[T](e: org.apache.spark.sql.Encoder[T]): ExpressionEncoder[T] = e match {
      case ee: ExpressionEncoder[T @unchecked] => ee
      case ae: AgnosticEncoder[T @unchecked]   => ExpressionEncoder(ae)
    }
    new org.apache.spark.sql.execution.aggregate.ScalaAggregator(
      children, agg, toExpr(inputEncoder), toExpr(agg.bufferEncoder),
      true, true, 0, 0, None).toAggregateExpression()
  }

  /** Apply a SparkSessionExtensions' injected functions to an
    * already-built session (normally they apply only at session
    * construction via `spark.sql.extensions`). Lets tests exercise
    * the exact extension builders against the shared test session.
    */
  def installFunctions(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession): Unit = {
    ext.registerFunctions(spark.sessionState.functionRegistry)
    ext.registerTableFunctions(spark.sessionState.tableFunctionRegistry)
  }
}
