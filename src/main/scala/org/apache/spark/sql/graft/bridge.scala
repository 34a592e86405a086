package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's package-private Column <-> Expression
  * converters (Spark 4 moved Column to a backend-agnostic representation;
  * `ExpressionUtils` is `private[sql]`). This shim is the single sanctioned
  * crossing point for graft's native Catalyst expressions.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
