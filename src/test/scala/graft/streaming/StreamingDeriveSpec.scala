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

  test("writeToTierStore: micro-batches land as ATOMIC append commits, manifest-visible") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val turns = FixtureGen
      .synthetic(spark, nConvs = 8, maxTurns = 600, partitions = 2)
      .as[graft.model.Turn]
      .collect()
      .toSeq
      .sortBy(_.ts.getTime)
    val maxTs = turns.map(_.ts.getTime).max
    val closer =
      graft.model.Turn("wm_closer", 0, "system", "wm", null, new java.sql.Timestamp(maxTs + 3600 * 1000L))

    val input = MemoryStream[graft.model.Turn]
    val out = java.nio.file.Files.createTempDirectory("graft_stream_store").toString
    def drain(): Unit = {
      val q = StreamingDerive
        .writeToTierStore(StreamingDerive.deriveStream(input.toDF(), 60L), out, "stream", s"$out/ckpt")
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query hung past the drain timeout")
    }
    // two separate drains → at least two append commits
    val (first, second) = turns.splitAt(turns.length / 2)
    input.addData(first); drain()
    input.addData(second :+ closer); drain()

    val store = new graft.store.TableStore(out, "tier_stream")
    val snaps = store.snapshots
    assert(snaps.size >= 2, s"expected >=2 append commits, got ${snaps.size}")
    // manifest-resolved read must see ALL finalized windows (no bare files
    // invisible to snapshots), and match the manifests' own row counts
    val read = store.read(spark).where(col("scope") =!= "wm_closer")
    assert(read.count() == store.currentSnapshot.get.partitions.map(_.rows).sum -
      store.read(spark).where(col("scope") === "wm_closer").count())
    // every streamed row equals its batch-derive value
    val batch = Derive.deriveSeries(turns.toDF(), 60L)
    val joined = read
      .select("scope", "metric", "bucket", "value")
      .join(batch.withColumnRenamed("value", "batch_value"), Seq("scope", "metric", "bucket"), "left")
    assert(joined.where(col("batch_value").isNull || col("value") =!= col("batch_value")).count() == 0)
    // appended partitions keep snapshot history: first commit's read is a
    // strict subset of the final one
    val firstRows = store.read(spark, snaps.head.snapshotId).count()
    assert(firstRows > 0 && firstRows < store.read(spark).count())
    // compaction after appends is content-identical (hash XOR composes)
    val frag = store.currentSnapshot.get.partitions.maxBy(_.files.size)
    if (frag.files.size > 1) {
      val before = frag.contentHash
      val after = store.compactPartition(spark, "day", frag.partition).partitions
        .find(_.partition == frag.partition).get
      assert(after.contentHash == before && after.files.size == 1)
    }
  }

  test("checkpoint RESET at the same path commits the new run's batches; plain restarts still skip") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    val turns = FixtureGen
      .synthetic(spark, nConvs = 4, maxTurns = 200, partitions = 2)
      .as[graft.model.Turn]
      .collect()
      .toSeq
    val maxTs = turns.map(_.ts.getTime).max
    val closer =
      graft.model.Turn("wm_closer", 0, "system", "wm", null, new java.sql.Timestamp(maxTs + 3600 * 1000L))

    val out = java.nio.file.Files.createTempDirectory("graft_stream_reset").toString
    val ckpt = s"$out/ckpt"
    def drain(input: MemoryStream[graft.model.Turn]): Unit = {
      val q = StreamingDerive
        .writeToTierStore(StreamingDerive.deriveStream(input.toDF(), 60L), out, "reset", ckpt)
        .start()
      assert(q.awaitTermination(120000), "AvailableNow query hung past the drain timeout")
      ()
    }
    val store = new graft.store.TableStore(out, "tier_reset")

    val in1 = MemoryStream[graft.model.Turn]
    in1.addData(turns :+ closer)
    drain(in1)
    val firstRun = store.read(spark).count()
    assert(firstRun > 0)
    val snapsAfterFirst = store.snapshots.size

    // plain same-checkpoint restart, no new data: the queryId is STABLE
    // across restarts, so replays stay deduped and nothing new commits
    drain(in1)
    assert(store.snapshots.size == snapsAfterFirst, "restart without new data must not commit")
    assert(store.read(spark).count() == firstRun)

    // RESET: delete the checkpoint, keep the table — a routine ops move.
    // Batch ids restart at 0 under a FRESH queryId; with path-only stream
    // identity the old durable watermark silently skipped every batch of the
    // new run (data loss). They must COMMIT: same input re-ingested → the
    // table now holds both generations' rows.
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val l = java.nio.file.Files.list(p)
        try l.iterator().forEachRemaining(rm) finally l.close()
      }
      java.nio.file.Files.deleteIfExists(p)
      ()
    }
    rm(java.nio.file.Paths.get(ckpt))
    val in2 = MemoryStream[graft.model.Turn]
    in2.addData(turns :+ closer)
    drain(in2)
    val afterReset = store.read(spark).count()
    assert(
      afterReset == 2 * firstRun,
      s"reset run's batches were skipped or partially committed: $afterReset vs ${2 * firstRun}"
    )
    // and the NEW generation's identity dedupes its own replays
    drain(in2)
    assert(store.read(spark).count() == afterReset)
  }
}
