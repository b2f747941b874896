package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the Column ⇄ Expression bridge, which Spark 4 marks
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils). Living in
  * a subpackage of org.apache.spark.sql grants access; nothing else from
  * Spark internals is touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
