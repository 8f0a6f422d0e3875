package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made `ExpressionUtils` private[sql],
  * so libraries defining custom Catalyst expressions need one shim in the
  * org.apache.spark.sql namespace (the same pattern the Spark ecosystem —
  * Sedona, Frameless, Delta — uses).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
