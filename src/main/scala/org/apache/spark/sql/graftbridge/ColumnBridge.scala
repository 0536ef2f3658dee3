package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 backs `Column` by ColumnNode
  * and scopes the converter (`classic.ExpressionUtils`) private[sql],
  * so custom Catalyst expressions (graft.plans.*) need this shim in
  * the sql namespace to become Columns without a FunctionRegistry
  * round-trip (which would tie them to sessions built with our
  * extensions). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
