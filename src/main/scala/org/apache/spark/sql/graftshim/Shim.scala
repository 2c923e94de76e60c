package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst `Expression`s and the public
  * `Column` API. Spark 4 made the Column <-> Expression conversion
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils in
  * columnNodeSupport.scala), so this one-file shim lives under the
  * org.apache.spark.sql package to re-export it. No Spark internals are
  * modified. */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
