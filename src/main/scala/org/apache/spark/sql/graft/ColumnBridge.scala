package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column`s and Catalyst `Expression`s.
  *
  * Spark 4's Column is backed by ColumnNode (the Connect refactor); the
  * classic-mode converter `ExpressionUtils` is `private[sql]`, so this
  * one-file shim lives in the `org.apache.spark.sql` namespace — the
  * standard pattern Spark extension libraries use to expose custom
  * Catalyst expressions as Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
