package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column↔Expression converters so graft's custom
  * Catalyst expressions (graft.functions) can surface as Columns. Lives in
  * the org.apache.spark.sql package solely for access — the standard
  * pattern for libraries extending Spark with native expressions. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eagerly convert a Column's node tree to a catalyst Expression
    * (ExpressionUtils.expression defers non-trivial nodes behind a lazy
    * ColumnNodeExpression wrapper, which hides window specs from static
    * inspection — graft.api.Overlap's halo-fit check needs the real
    * tree). */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
