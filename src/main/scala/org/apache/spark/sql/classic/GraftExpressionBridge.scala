package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-placed bridge to the classic Column↔Expression converters,
  * which Spark 4 made package-private behind the Connect API split. Only
  * used to wrap graft's custom codegen'd expressions as Columns. */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
