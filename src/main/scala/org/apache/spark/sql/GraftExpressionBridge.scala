package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column ↔ Expression converters, so
  * graft's custom Catalyst expressions ([[graft.functions.DotProduct]],
  * [[graft.functions.SimHash64]]) can be used through the public Column
  * API. Same technique every Spark extension library uses: a single shim
  * compiled into the `org.apache.spark.sql` package; no Spark internals
  * are modified. */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
