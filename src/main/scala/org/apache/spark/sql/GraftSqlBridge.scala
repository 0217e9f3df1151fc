package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression ↔ Column converters for graft's native Catalyst
  * expressions (graft.functions.VectorExprs). Spark 4 exposes no public
  * API for wrapping a custom `Expression` into a `Column`
  * (`classic.ExpressionUtils` is `private[sql]`), so this one-file
  * bridge lives in the `org.apache.spark.sql` package — the established
  * community pattern for typed-expression libraries. Nothing else in
  * the codebase may declare itself into Spark's namespace. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
