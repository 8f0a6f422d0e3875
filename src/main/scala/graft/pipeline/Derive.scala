package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Transcript-table → per-series points (the engine's SOURCE stage).
  *
  * Input schema (BASELINE.json input_hint): conv_id STRING, turn_idx INT,
  * role STRING, text STRING, tool STRING, ts TIMESTAMP.
  *
  * Output: long rows (scope, metric, bucket, value) where scope = conv_id,
  * bucket = epoch-second tumbling bucket. Metrics mirror the reference's
  * series (`FileDataLoader.java:94-113`):
  *   regular  — count of non-error turns per bucket
  *   error    — count of error turns (role='tool' AND text LIKE 'ERROR%')
  * plus north_star extras (excluded from parity): text_len (sum of turn text
  * lengths), tool_calls (count of tool-invoking turns).
  *
  * Scale notes: one shuffle — groupBy(conv_id, bucket) with partial (map-side)
  * aggregation, so a hot conversation's 10^9 turns combine before the
  * exchange; unpivot via stack() is a narrow projection. AQE handles residual
  * skew; the two-phase salted variant is in SaltedAgg.
  */
object Derive {

  /** error-turn predicate — fixed here and in FixtureGen */
  def isErrorTurn: Column = col("role") === "tool" && col("text").startsWith("ERROR")

  /** turns counted as activity: anything but system notices and error turns.
    * `system` turns mark a bucket as observed without contributing activity —
    * an observed-but-idle bucket (fixture rows with regular=0) stays a real
    * zero point rather than a gap.
    */
  def isRegularTurn: Column = col("role") =!= "system" && !isErrorTurn

  def deriveSeries(turns: DataFrame, resolution: Long, extraMetrics: Boolean = false): DataFrame = {
    val bucket = (unix_timestamp(col("ts")) - unix_timestamp(col("ts")) % resolution).as("bucket")
    val agg = turns
      .select(col("conv_id").as("scope"), bucket, col("role"), col("text"), col("tool"))
      .groupBy(col("scope"), col("bucket"))
      .agg(
        sum(when(isRegularTurn, 1L).otherwise(0L)).cast("double").as("regular"),
        sum(when(isErrorTurn, 1L).otherwise(0L)).cast("double").as("error"),
        sum(length(col("text"))).cast("double").as("text_len"),
        sum(when(col("tool").isNotNull, 1L).otherwise(0L)).cast("double").as("tool_calls")
      )
    val metrics =
      if (extraMetrics) Seq("regular", "error", "text_len", "tool_calls") else Seq("regular", "error")
    val stackExpr = metrics.map(m => s"'$m', $m").mkString(s"stack(${metrics.size}, ", ", ", ")")
    agg
      .select(col("scope"), col("bucket"), expr(s"$stackExpr as (metric, value)"))
      // the reference drops series with no data at all; zero-count buckets
      // for `error` only exist where the scope has SOME error rows — callers
      // with 2-col fixtures have no error rows anywhere, matching "skip
      // empty" (`AbstractDataLoader.java:176-179`)
      .where(col("value").isNotNull)
  }

  /** Drop all-zero series (reference: a series absent from the input has no
    * rows at all; our error counts materialize zeros when the scope has any
    * turn in the bucket). A series is kept iff any bucket is non-zero.
    */
  def dropEmptySeries(points: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("scope"), col("metric"))
    points
      .withColumn("_mx", max(abs(col("value"))).over(w))
      .where(col("_mx") > 0)
      .drop("_mx")
  }
}
