package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge. Spark 4 moved `Column` behind the
  * sql-api facade and made `classic.ExpressionUtils` `private[sql]`; this
  * object lives in `org.apache.spark.sql` so extension libraries (graft's
  * custom expressions) can still build `Column`s from `Expression`s — the
  * same approach third-party Spark extensions use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
