package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 hides Column↔Expression conversion behind `private[sql]`
  * (`classic.ExpressionUtils`); custom native Expressions still need it.
  * This glue lives in the sql package purely to re-expose those two
  * conversions to graft — no other internals are touched. */
object GraftColumnGlue {
  def toExpr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** EAGER Column→Expression conversion (function calls become
    * `UnresolvedFunction` catalyst nodes the analyzer resolves at
    * fixpoint). `toExpr`'s lazy `ColumnNodeExpression` wrapper is only
    * unwrapped on classic Dataset paths — a FunctionRegistry builder
    * (the graft SQL-macro surface) needs the real tree. */
  def toCatalystExpr(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Build a DataFrame over a custom LogicalPlan (Dataset.ofRows is
    * private[sql]) — needed to expose custom operators like the native
    * as-of join through the public DataFrame API. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def planOf(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].logicalPlan
}
