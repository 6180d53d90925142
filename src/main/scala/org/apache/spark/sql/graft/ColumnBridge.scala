package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils — Spark 4 moved the old
  * public `Column(expr)` constructor behind the ColumnNode API). Lives in a
  * subpackage of org.apache.spark.sql purely for access; the standard shim
  * any library registering native Catalyst expressions ships.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
