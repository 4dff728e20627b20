package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst [[Expression]]s and the public [[Column]]
  * API. Spark 4 moved Column construction behind ColumnNode
  * (connect-compatible); the classic bridge lives in
  * `org.apache.spark.sql.classic.ExpressionUtils`, package-private to
  * `org.apache.spark.sql` — hence this shim, the standard pattern for
  * third-party Catalyst extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
