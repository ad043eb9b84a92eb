package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Catalyst-expression
  * converters (`classic.ExpressionUtils`), placed in the
  * `org.apache.spark.sql` package for access — the standard pattern for
  * libraries that construct native Catalyst expressions as Columns
  * without going through the session function registry (which would tie
  * every expression-built helper to a session that ran the engine's
  * registration).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
