package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column implementation-agnostic; the catalyst bridge
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is private[sql]. This
  * shim lives in an org.apache.spark.sql subpackage purely to re-export the
  * two conversions graft's custom expressions need. No Spark internals are
  * modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
