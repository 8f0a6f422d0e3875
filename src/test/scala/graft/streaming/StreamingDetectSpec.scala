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
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, (String, Long, Double, String))]
    val q = StreamingDetect
      .detectStream(input.toDS(), cfg)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_sd").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.model.Validated], id: Long) =>
        emitted.synchronized {
          emitted ++= batch.collect().map(v => id -> ((v.scope, v.ts, v.score, v.details)))
        }
        ()
      }

    // drain by ingested-row count, NOT AvailableNow + awaitTermination
    // (burned 2 × ~120 s here in timer-only batches) and NOT
    // processAllAvailable (never returns) — see the detectStream scaladoc
    input.addData(first)
    val q1 = q.start(); StreamingRandomDetectSpec.drainAndStop(q1, first.size.toLong)
    input.addData(second)
    val q2 = q.start(); StreamingRandomDetectSpec.drainAndStop(q2, second.size.toLong)

    // final state = the LAST batch that emitted anything for the scope
    val lastBatch = emitted.map(_._1).max
    val finalSet = emitted.filter(_._1 == lastBatch).map(_._2).map { case (_, ts, score, det) => ts -> ((score, det)) }.toMap

    val batchValidated = Detect
      .detectValidated(spark.createDataset(pts), cfg)
      .collect()
      .map(v => v.ts -> ((v.score, v.details)))
      .toMap

    // scores AND the full reference-shaped details JSON must match batch —
    // streaming must not silently degrade the payload
    assert(finalSet == batchValidated, s"streaming final vs batch: $finalSet vs $batchValidated")
    assert(finalSet.nonEmpty)
    finalSet.values.foreach { case (_, det) =>
      assert(det.contains("\"outliers\":[") && det.contains("\"timeseries\":{"), det.take(120))
    }
  }

  test("idle scopes are EVICTED after the processing-time timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val cfg = EngineConfig()
    val pts = fixturePoints("real_test_4_peak.tsv").sortBy(p => (p.metric, p.bucket))

    val input = MemoryStream[Detect.SeriesPoint]
    val stateRows = scala.collection.mutable.ArrayBuffer.empty[Int]
    // tiny timeout: the idle scope must be gone by the follow-up batch
    val stream = StreamingDetect.detectStream(input.toDS(), cfg, idleTimeoutMs = 50L)
    val q = stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_sd_evict").toString)
      .trigger(Trigger.ProcessingTime(200))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.model.Validated], id: Long) =>
        batch.collect(); () // force the batch
      }
      .start()
    try {
      input.addData(pts)
      // wait until the scope's data batch has processed, then let it idle
      // past the timeout; subsequent empty batches fire the timed-out branch
      val deadline = System.currentTimeMillis() + 60000
      var evicted = false
      while (!evicted && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          evicted = p.stateOperators.head.numRowsTotal == 0 && p.batchId > 0
      }
      assert(evicted, "state store still holds rows for the idle scope after timeout")
    } finally q.stop()
  }

  test("boundState keeps at least one point per metric when metrics outnumber maxSeriesPoints") {
    // 5 metrics × 3 buckets, cap 4: the integer per-metric budget would be
    // 4/5 = 0 and takeRight(0) silently wiped EVERY series each batch —
    // the floor keeps the newest bucket per metric instead
    val pts = (for (m <- 0 until 5; b <- 0 until 3)
      yield Detect.SeriesPoint("sc", s"m$m", 1000L + b * 60, b.toDouble)).toArray
    val bounded = StreamingDetect.boundState(pts, maxSeriesPoints = 4)
    assert(bounded.map(_.metric).distinct.length == 5, "every metric must retain at least one point")
    assert(bounded.forall(_.bucket == 1120L), "the NEWEST bucket per metric is the one kept")
    // under the cap: untouched
    assert(StreamingDetect.boundState(pts, maxSeriesPoints = 100) sameElements pts)
    // normal case: budget divides evenly, newest buckets kept per metric
    val two = StreamingDetect.boundState(pts, maxSeriesPoints = 10)
    assert(two.length == 10 && two.count(_.metric == "m0") == 2 && two.forall(_.bucket >= 1060L))
  }
}
