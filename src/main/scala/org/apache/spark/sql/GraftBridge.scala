package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Bridge into the `private[sql]` Column ⇄ Expression converters
 * (`classic.ExpressionUtils`) — the standard extension-library idiom for
 * exposing a custom Catalyst expression as a user-facing `Column`
 * (Spark 4 moved the constructors behind the sql package boundary).
 * Nothing else from the private surface is touched.
 */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
