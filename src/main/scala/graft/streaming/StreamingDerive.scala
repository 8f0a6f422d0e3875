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

  /** write a derived stream into a BARE parquet directory via foreachBatch
    * (no manifests — for consumers that list the directory directly;
    * OutputMode.Append emits a window only once its watermark passes).
    * Prefer `writeToTierStore` for manifest-resolved tiers: files appended
    * here are INVISIBLE to a TableStore's snapshot reads.
    */
  def writeToTier(derived: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    derived.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(path)
      }

  /** write a derived stream into a TableStore tier: each micro-batch is an
    * ATOMIC append commit (Iceberg AppendFiles semantics — files added,
    * rows/hashes merged into the partition manifests, never rewritten), so
    * batch readers, time travel and TTL/compaction/expire all see streaming
    * data through the same snapshot machinery as batch tiers. Safe alongside
    * concurrent batch writers (optimistic CREATE_NEW retry). Fragmentation
    * from one-file-per-batch appends is bounded by `jobs.Maintain`.
    */
  def writeToTierStore(derived: DataFrame, base: String, tier: String, checkpoint: String): DataStreamWriter[Row] = {
    // stream identity = the NORMALIZED checkpoint location (stable across
    // restarts of THIS stream even under relative-vs-absolute/trailing-slash
    // spellings, distinct per stream): batch ids alone collide across
    // streams/checkpoint resets — Iceberg's txnAppId+txnVersion pattern.
    // URI checkpoints (hdfs://, s3a://, file:) are NOT local paths — running
    // them through Paths.get would prefix the driver's cwd and make stream
    // identity cwd-dependent; they pass through verbatim.
    val canonical = {
      // file: URIs are local paths — unify them with the plain spelling
      val c = if (checkpoint.startsWith("file:")) checkpoint.stripPrefix("file:") else checkpoint
      if (c.contains("://")) c.stripSuffix("/")
      else java.nio.file.Paths.get(c).toAbsolutePath.normalize.toString
    }
    val streamId = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    derived.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        appendBatch(new graft.store.TableStore(base, s"tier_$tier"), batch, streamId, id)
      }
  }

  /** highest batch id COMMITTED by this process per stream — covers the
    * window where the store commit landed but the watermark write (or the
    * query itself) died: a same-JVM query restart replays that id and this
    * map repairs the watermark instead of double-committing. A fresh
    * process has no entry and probes the durable lineage instead.
    */
  private val inProcessCommitted = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** test hook: simulate a process restart — production code never calls this */
  private[graft] def forgetReplayChecks(): Unit = inProcessCommitted.clear()

  /** One micro-batch → one idempotent append commit. REPLAY guard (a crash
    * between the store commit and the stream's offset commit re-runs the
    * same batch id): fast path = per-stream commit watermark (one file
    * read); same-JVM query restarts are repaired from `inProcessCommitted`;
    * the manifest/ledger scan (`hasCommit`) runs only while this process
    * has not yet committed anything for the stream — at most the first
    * batch after a process restart. Empty batches advance the watermark
    * without committing a snapshot.
    */
  private[graft] def appendBatch(store: graft.store.TableStore, batch: DataFrame, streamId: String, id: Long): Unit = {
    if (store.streamWatermark(streamId).exists(_ >= id)) return
    val lineage = s"stream-$streamId-batch-$id"
    val mem = Option(inProcessCommitted.get(streamId)).map(_.longValue)
    if (mem.exists(_ >= id) && store.hasCommit(lineage)) {
      // this process committed the batch and only the watermark write was
      // lost — repair it. The DURABLE lineage must confirm: after a
      // same-JVM checkpoint/table reset, batch ids restart at 0 while the
      // in-memory mark is stale, and trusting it alone would silently drop
      // the new run's data. hasCommit only runs on this anomalous path.
      store.setStreamWatermark(streamId, id)
      return
    }
    if (mem.isEmpty && store.hasCommit(lineage)) {
      // fresh process replaying a batch whose commit landed pre-crash
      store.setStreamWatermark(streamId, id)
      inProcessCommitted.put(streamId, id)
      return
    }
    // persist: isEmpty and the staged write would otherwise each re-execute
    // the micro-batch's full plan
    val b = batch.persist()
    try if (!b.isEmpty) { store.write(graft.store.TierBuilder.withDay(b), "day", lineage, append = true); () }
    finally b.unpersist()
    inProcessCommitted.put(streamId, id)
    store.setStreamWatermark(streamId, id)
  }
}
