package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column ↔ catalyst Expression bridge. Spark 4 moved these behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); this is
  * the standard extension-library pattern for reaching them.
  */
object Bridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
