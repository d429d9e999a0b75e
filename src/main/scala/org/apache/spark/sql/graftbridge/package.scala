package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils) for the engine's
  * custom Catalyst expressions. Lives inside the org.apache.spark.sql
  * package solely to satisfy the access modifier — the standard pattern
  * for third-party Spark extension libraries on Spark 4's split
  * Column API.
  */
package object graftbridge {
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
