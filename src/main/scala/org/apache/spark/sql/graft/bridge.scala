package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4's Column wraps a ColumnNode and the
  * conversion helpers are `private[sql]`, so libraries adding custom
  * Catalyst expressions need this one-file shim inside the sql package —
  * the same access pattern third-party Spark extensions use.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
