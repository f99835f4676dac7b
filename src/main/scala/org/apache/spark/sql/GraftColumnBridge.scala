package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇔ Expression converters — the
  * standard extension-library shim (a class in the `org.apache.spark.sql`
  * package namespace), needed because Spark 4 backs `Column` with
  * ColumnNodes rather than expressions: SQL function builders registered
  * via `SparkSessionExtensions` receive and must return catalyst
  * [[Expression]]s, while graft's composed functions (the geo family) are
  * written against the public Column API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Eagerly converts the whole ColumnNode tree (functions become
    * `UnresolvedFunction`s the analyzer then resolves normally) —
    * `ExpressionUtils.expression` alone wraps lazily in a
    * `ColumnNodeExpression` that nothing unwraps on the
    * SparkSessionExtensions function-builder path and that cannot
    * evaluate or codegen.
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
