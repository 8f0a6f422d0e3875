package graft.streaming

import graft.jobs.FixtureGen
import graft.pipeline.Derive
import graft.spark.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming derive == batch derive on the same turn set (windows finalized
  * by watermark; AvailableNow trigger drains the source).
  */
class StreamingDeriveSpec extends SparkTestBase {

  test("streaming tumbling-window derive matches batch derive") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val turns = FixtureGen
      .synthetic(spark, nConvs = 10, maxTurns = 800, partitions = 2)
      .as[graft.model.Turn]
      .collect()
      .toSeq

    val input = MemoryStream[graft.model.Turn]
    input.addData(turns)
    // a final late-side marker far in the future closes all watermarks
    val maxTs = turns.map(_.ts.getTime).max
    input.addData(
      graft.model.Turn("wm_closer", 0, "system", "wm", null, new java.sql.Timestamp(maxTs + 3600 * 1000L))
    )

    val out = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val q = StreamingDerive
      .writeToTier(StreamingDerive.deriveStream(input.toDF(), 60L), s"$out/tier", s"$out/ckpt")
      .start()
    q.awaitTermination(120000)

    val streamed = spark.read
      .parquet(s"$out/tier")
      .where(col("scope") =!= "wm_closer")
      .groupBy("scope", "metric", "bucket")
      .agg(sum("value").as("value"))

    val batch = Derive.deriveSeries(turns.toDF(), 60L)
    // streaming emits rows for finalized windows only; every emitted row must
    // match the batch value, and coverage must be complete except possibly
    // the last window per scope (watermark boundary)
    val joined = streamed
      .join(batch.withColumnRenamed("value", "batch_value"), Seq("scope", "metric", "bucket"), "left")
    assert(joined.where(col("batch_value").isNull || col("value") =!= col("batch_value")).count() == 0)
    val batchCount = batch.count()
    val streamedCount = streamed.count()
    assert(streamedCount >= batchCount - 2 * 10, s"streamed $streamedCount of $batchCount")
  }
}
