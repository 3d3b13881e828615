package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between Catalyst [[Expression]]s and user-facing [[Column]]s.
  *
  * Spark 4.x made `Column` expression-agnostic (it wraps a `ColumnNode`);
  * the conversion helpers live in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]`. Declaring this one-file forwarder inside the
  * `org.apache.spark.sql` package is the minimal public-surface-only way to
  * build Columns from custom expressions (e.g. graft's native codegen'd
  * aggregates) without shading or reflection. No Spark internals are
  * modified; this is a pure call-through.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
