package graft.streaming

import graft.jobs.FixtureGen
import graft.kernel.OracleHarness
import graft.model.EngineConfig
import graft.pipeline.Derive
import graft.spark.{Detect, SparkTestBase}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming detection == batch detection once all data has arrived: the
  * stateful per-scope kernel re-scores on each micro-batch; the LAST batch's
  * emissions for a scope are its final validated set.
  */
class StreamingDetectSpec extends SparkTestBase {

  private def fixturePoints(fixture: String): Seq[Detect.SeriesPoint] = {
    val raw = OracleHarness.parseTsv(fixture)
    raw.toSeq.flatMap { case (metric, pts) =>
      pts.map(p => Detect.SeriesPoint(fixture, metric, p.ts, p.v))
    }
  }

  test("streaming detect over two micro-batches converges to batch detect") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val fixture = "real_test_4_peak.tsv"
    val cfg = EngineConfig()
    val pts = fixturePoints(fixture).sortBy(p => (p.metric, p.bucket))
    val (first, second) = pts.splitAt(pts.length / 2)

    val input = MemoryStream[Detect.SeriesPoint]
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, (String, Long, Double))]
    val q = StreamingDetect
      .detectStream(input.toDS(), cfg)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_sd").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.model.Validated], id: Long) =>
        emitted.synchronized {
          emitted ++= batch.collect().map(v => id -> ((v.scope, v.ts, v.score)))
        }
        ()
      }

    input.addData(first)
    val q1 = q.start(); q1.awaitTermination(120000)
    input.addData(second)
    val q2 = q.start(); q2.awaitTermination(120000)

    // final state = the LAST batch that emitted anything for the scope
    val lastBatch = emitted.map(_._1).max
    val finalSet = emitted.filter(_._1 == lastBatch).map(_._2).map { case (_, ts, score) => ts -> score }.toMap

    val batchValidated = Detect
      .detectValidated(spark.createDataset(pts), cfg)
      .collect()
      .map(v => v.ts -> v.score)
      .toMap

    assert(finalSet == batchValidated, s"streaming final vs batch: $finalSet vs $batchValidated")
    assert(finalSet.nonEmpty)
  }
}
