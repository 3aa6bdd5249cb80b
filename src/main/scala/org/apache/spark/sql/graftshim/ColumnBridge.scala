package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for Spark 4's column-node API. The classic
  * ExpressionUtils converters are private[sql], so this shim lives in an
  * org.apache.spark.sql subpackage — the established pattern for libraries
  * that construct Catalyst expressions directly. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
