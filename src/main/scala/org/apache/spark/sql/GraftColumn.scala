package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `org.apache.spark.sql` package: wrap a catalyst
  * `Expression` as a public `Column` (and back) without a round trip
  * through the session function registry. Lets column-only helpers
  * (e.g. [[graft.ext.Text.hash60]]) build native codegen expressions
  * directly — `call_function` requires per-session registration, which
  * a `Column => Column` helper has no session handle to perform. */
object GraftColumn {
  def of(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
