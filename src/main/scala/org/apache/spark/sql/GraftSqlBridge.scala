package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters for
  * graft's custom Catalyst expressions. Spark 4 moved Column to a
  * backend-agnostic node tree; classic-backend extension libraries
  * convert through `org.apache.spark.sql.classic.ExpressionUtils`, which
  * is package-private — hence this one-file bridge (the conventional
  * pattern for Catalyst extension libraries).
  */
object GraftSqlBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
