package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API. Spark 4 moved Column construction behind
  * `private[sql] classic.ExpressionUtils`; this object re-exports it from
  * inside the `org.apache.spark.sql` package so graft code can lift a raw
  * `Expression` into a `Column` (and back) without a function-registry
  * round-trip.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
