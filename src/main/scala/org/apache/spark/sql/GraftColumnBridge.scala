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

  /** the persisted RDD backing a `localCheckpoint()`ed Dataset (its plan is
    * a LogicalRDD leaf — private[sql], hence this shim). Iterative drivers
    * use it to UNPERSIST superseded checkpoint generations: each
    * localCheckpoint pins MEMORY_AND_DISK blocks until the session drops
    * them, so a loop that checkpoints per round would otherwise leak one
    * cached generation per round.
    */
  def checkpointedRdd(df: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case l: execution.LogicalRDD => l.rdd }
}
