package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge: Spark 4 removed `Column.expr` from the
  * public API; the supported converter (`classic.ExpressionUtils`) is
  * `private[sql]`, so this one-file shim lives in the sql package
  * namespace to expose it to graft's custom expressions. */
object ColumnBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
