package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column↔Expression conversion behind private[sql]
  * (`classic.ExpressionUtils`); custom Catalyst expressions still need
  * it to surface as user-facing Columns. This shim is the single
  * sanctioned crossing point (same technique every Spark extension
  * library uses for 4.x).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
