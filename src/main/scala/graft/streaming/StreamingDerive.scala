package graft.streaming

import graft.pipeline.Derive
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming ingestion (north_star stretch): a stream of
  * transcript turns → watermarked tumbling-window per-series counts →
  * foreachBatch into the same TableStore tier writer the batch path uses.
  * The stateful aggregation keys are (conv_id, window) — identical to the
  * batch Derive, so the streaming raw tier is row-compatible with the batch
  * one; the coarser tiers are rebuilt incrementally per micro-batch.
  */
object StreamingDerive {

  /** turns stream → per-series bucket counts. Watermark = 2× the bucket so
    * late turns within one bucket still land; later ones are dropped exactly
    * like the reference ignores out-of-range data.
    */
  def deriveStream(turns: DataFrame, resolution: Long): DataFrame = {
    val win = window(col("ts"), s"$resolution seconds")
    turns
      .withWatermark("ts", s"${2 * resolution} seconds")
      .groupBy(col("conv_id").as("scope"), win)
      .agg(
        sum(when(Derive.isRegularTurn, 1L).otherwise(0L)).cast("double").as("regular"),
        sum(when(Derive.isErrorTurn, 1L).otherwise(0L)).cast("double").as("error")
      )
      .select(
        col("scope"),
        unix_timestamp(col("window.start")).as("bucket"),
        expr("stack(2, 'regular', regular, 'error', error) as (metric, value)")
      )
      .where(col("value").isNotNull)
  }

  /** write a derived stream into a parquet tier via foreachBatch (append of
    * finalized windows; OutputMode.Append emits a window only once its
    * watermark passes — idempotent tier appends).
    */
  def writeToTier(derived: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    derived.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(path)
      }
}
