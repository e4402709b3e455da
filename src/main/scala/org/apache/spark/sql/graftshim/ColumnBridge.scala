package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge to the `private[sql]` Column⇄Expression converters —
  * the one place this library reaches into Spark's namespace. Spark 4
  * hid the direct `new Column(expr)` constructor; extension libraries
  * either register every function (FunctionRegistry + call_function)
  * or bridge like this for a typed Column API. We do both: the
  * registry path in graft.functions.GraftExtensions, this bridge for
  * the compile-time-typed entry points. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
