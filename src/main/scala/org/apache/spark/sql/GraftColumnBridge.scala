package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column<->Expression converters so graft's
  * custom Catalyst expressions can surface as Columns. Lives in the
  * spark.sql package purely for `private[sql]` visibility; contains no
  * Spark code.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Public alias for the `private[sql]` AbstractDataType, so graft
    * expressions can declare `ExpectsInputTypes.inputTypes` (analysis-
    * time type contracts) without living in the sql package. */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
