package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression conversion.
  * Spark 4 routes Column through ColumnNode; third-party Catalyst extensions
  * (this is the same approach Delta/Frameless use) need one in-package shim
  * to wrap a custom Expression as a user-facing Column.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
