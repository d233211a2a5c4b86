package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 hides Column↔Expression conversion behind `private[sql]`
  * (`classic.ExpressionUtils`); custom native Expressions still need it.
  * This glue lives in the sql package purely to re-expose those two
  * conversions to graft — no other internals are touched. */
object GraftColumnGlue {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
