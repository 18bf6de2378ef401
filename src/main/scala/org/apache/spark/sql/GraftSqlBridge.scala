package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 moved the classic
  * `new Column(expr)` constructor behind `private[sql]`
  * (classic.ExpressionUtils); custom Catalyst expressions still need
  * it, so re-export the two conversions from inside the package.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function builder on an EXISTING session (sessionState is
    * private[sql]); new sessions should prefer GraftExtensions via
    * spark.sql.extensions. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
