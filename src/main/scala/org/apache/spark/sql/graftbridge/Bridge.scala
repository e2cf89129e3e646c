package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for custom expressions.
  * ExpressionUtils is private[sql] in Spark 4, so this shim lives under the
  * org.apache.spark.sql package -- the standard pattern for libraries that
  * define their own Catalyst expressions against the classic session API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
