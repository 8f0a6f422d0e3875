package graft.streaming

import graft.kernel.{OracleHarness, RandomFixtures}
import graft.model.EngineConfig
import graft.spark.{Detect, SparkTestBase}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming leg of the seeded randomized differential: the same generated
  * fixtures [[graft.kernel.KernelRandomDifferentialSpec]] pins against the
  * reference jar arrive as SHUFFLED micro-batches (seeded order, 2–3
  * restarts of an AvailableNow query over one checkpoint), and the last
  * batch's emissions must equal `Detect.detectValidated` on the full data —
  * scores AND details payload. Combined with [[graft.spark
  * .SparkRandomDetectSpec]] (spark == kernel) and the kernel-vs-reference
  * sweep, this closes the loop streaming == batch == kernel == reference on
  * input shapes the curated corpus doesn't cover. Three fixtures only:
  * streaming query startup dominates the runtime, and the kernel
  * equivalence itself is already swept 10-wide.
  */
class StreamingRandomDetectSpec extends SparkTestBase {
  import StreamingRandomDetectSpec.drainAndStop

  private def allPoints(i: Int): Seq[Detect.SeriesPoint] = {
    val raw = OracleHarness.parseTsvAt(RandomFixtures.path(i))
    raw.toSeq.flatMap { case (m, ps) => ps.map(p => Detect.SeriesPoint(s"kr_$i", m, p.ts, p.v)) }
  }

  private def cfgOf(i: Int): EngineConfig =
    EngineConfig.fromSettings(OracleHarness.settingsAt(RandomFixtures.path(i)))

  test("streaming over shuffled micro-batches == batch detect on 3 random fixtures") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // first 3 fixtures whose FULL-data run validates something: append-mode
    // emissions cannot express "validated set became empty", so empty-final
    // fixtures have nothing streaming could be compared on
    val candidates = (0 until sys.props.getOrElse("graft.randFixtures", "10").toInt).iterator.map { i =>
      val batchValidated = Detect
        .detectValidated(s.createDataset(allPoints(i)), cfgOf(i))
        .collect()
        .map(v => v.ts -> ((v.score, v.details)))
        .toMap
      (i, batchValidated)
    }.filter(_._2.nonEmpty).take(3).toSeq
    assert(candidates.size == 3, "sweep needs 3 fixtures with validated outliers")

    for ((i, batchValidated) <- candidates) {
      val rnd = new scala.util.Random(31L + i)
      val pts = rnd.shuffle(allPoints(i))
      val k = 2 + rnd.nextInt(2)
      val batches = pts.grouped(math.max(1, (pts.size + k - 1) / k)).toSeq

      val input = MemoryStream[Detect.SeriesPoint]
      val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, (Long, Double, String))]
      val checkpoint = OracleHarness.tempDir(s"graft_srand_$i").toString
      val stream = StreamingDetect.detectStream(input.toDS(), cfgOf(i))

      for (b <- batches) {
        input.addData(b)
        val q = stream.writeStream
          .outputMode(OutputMode.Append)
          .option("checkpointLocation", checkpoint)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.model.Validated], id: Long) =>
            emitted.synchronized {
              emitted ++= batch.collect().map(v => id -> ((v.ts, v.score, v.details)))
            }
            ()
          }
          .start()
        drainAndStop(q, b.size.toLong)
      }

      assert(emitted.nonEmpty, s"fixture $i emitted nothing")
      val lastBatch = emitted.map(_._1).max
      val finalSet =
        emitted.filter(_._1 == lastBatch).map { case (_, (ts, score, det)) => ts -> ((score, det)) }.toMap
      assert(finalSet == batchValidated, s"fixture $i streaming final vs batch diverged")
    }
  }
}

private[streaming] object StreamingRandomDetectSpec {

  /** Wait until the running query has ingested `expectedRows` input rows (a
    * reported progress means the batch is committed and its foreachBatch
    * has run), then stop it. Detect streams cannot be drained with
    * `processAllAvailable` or `Trigger.AvailableNow` + `awaitTermination`:
    * pending ProcessingTimeTimeout timers make the engine schedule no-data
    * batches indefinitely (see the `detectStream` scaladoc), so the former
    * never returns and the latter burns its full timeout in timer-only
    * batches. Counts are accumulated per batchId — `recentProgress` is a
    * bounded ring buffer (~100 entries), so a plain sum would undercount
    * once timer-only batches evict the data batches' entries. A query that
    * dies mid-drain surfaces its own StreamingQueryException immediately
    * instead of spinning out the timeout.
    */
  def drainAndStop(
      q: org.apache.spark.sql.streaming.StreamingQuery,
      expectedRows: Long,
      timeoutMs: Long = 120000L
  ): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    val perBatch = scala.collection.mutable.Map.empty[Long, Long]
    def seen: Long = {
      for (p <- q.recentProgress) perBatch(p.batchId) = p.numInputRows
      perBatch.values.sum
    }
    try {
      while (seen < expectedRows && System.currentTimeMillis() < deadline) {
        q.exception.foreach(e => throw e)
        require(
          q.isActive,
          s"query terminated cleanly after ingesting only $seen of $expectedRows rows"
        )
        Thread.sleep(100)
      }
      val s = seen
      require(s >= expectedRows, s"drained only $s of $expectedRows rows before the timeout")
    } finally q.stop()
  }
}
