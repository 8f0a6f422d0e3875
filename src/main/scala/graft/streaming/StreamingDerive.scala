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
    * AT-LEAST-ONCE: a crash between the parquet append and the checkpoint's
    * offset commit replays the whole micro-batch on restart and appends its
    * rows AGAIN — there is no replay guard here by design (a bare directory
    * has nowhere to record lineage). Consumers must tolerate duplicates or
    * dedup on (scope, metric, bucket). Prefer `writeToTierStore` for
    * exactly-once manifest-resolved tiers: files appended here are also
    * INVISIBLE to a TableStore's snapshot reads.
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
    *
    * UPGRADE CONTRACT (identity change, one-time): builds before the
    * queryId-aware identity keyed the replay guard on md5(path) alone.
    * Upgrading across that boundary renames every stream's identity, so a
    * batch left in the crash window by the OLD build (store commit durable,
    * checkpoint offset not) would be re-committed once by the new build —
    * its old lineage id is not probed. Operational rule: STOP each stream
    * cleanly (let AvailableNow drain; verify the checkpoint's latest offset
    * is committed) before upgrading, exactly as for any Spark checkpoint
    * format migration. We deliberately do NOT probe the legacy path-only id:
    * that id is indistinguishable from a pre-reset generation's, and trusting
    * it would re-introduce the silent post-reset data drop this identity
    * exists to fix — a one-time, detectable duplicate under a documented
    * upgrade rule is strictly safer than silent loss.
    */
  def writeToTierStore(derived: DataFrame, base: String, tier: String, checkpoint: String): DataStreamWriter[Row] = {
    // stream identity = NORMALIZED checkpoint location + the checkpoint's
    // queryId (Iceberg's txnAppId+txnVersion pattern, generation-aware):
    //  - the path distinguishes streams (batch ids alone collide across
    //    streams) and normalization makes relative-vs-absolute/trailing-slash
    //    spellings agree;
    //  - the queryId (from the checkpoint's `metadata` file, written by
    //    StreamExecution at query start, STABLE across restarts of the same
    //    checkpoint, REGENERATED when the directory is deleted) distinguishes
    //    checkpoint GENERATIONS. Path-only identity silently dropped a reset
    //    run's data: batch ids restart at 0 with different composition, and
    //    the old durable watermark skipped them all. With the queryId folded
    //    in, a reset is a fresh stream — its batches re-ingest and COMMIT
    //    (the table keeps both generations' rows; dedup across a reset is the
    //    operator's job, not the committer's).
    // URI checkpoints (hdfs://, s3a://, file:) are NOT local paths — running
    // them through Paths.get would prefix the driver's cwd and make stream
    // identity cwd-dependent; they pass through verbatim.
    val canonical = {
      // file: URIs are local paths — unify them with the plain spelling
      val c = if (checkpoint.startsWith("file:")) checkpoint.stripPrefix("file:") else checkpoint
      if (c.contains("://")) c.stripSuffix("/")
      else java.nio.file.Paths.get(c).toAbsolutePath.normalize.toString
    }
    derived.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // resolved PER BATCH (one small-file read, same order of cost as the
        // watermark read): memoizing by path would serve a stale queryId
        // after a same-JVM checkpoint reset — the exact failure this guards.
        val queryId = checkpointQueryId(batch.sparkSession, checkpoint)
        val streamId = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$canonical\n$queryId".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
        appendBatch(new graft.store.TableStore(base, s"tier_$tier"), batch, streamId, id)
      }
  }

  private val metadataIdField = """"id"\s*:\s*"([^"]+)"""".r

  /** the checkpoint's queryId, read from `<checkpoint>/metadata` through the
    * Hadoop filesystem of the location (works for local paths and URI
    * checkpoints alike). StreamExecution writes the file before running any
    * batch, so inside foreachBatch it always exists; a short bounded retry
    * covers eventual-visibility filesystems, then the failure propagates —
    * committing under a GUESSED identity risks exactly the silent skip this
    * mechanism prevents.
    */
  private[graft] def checkpointQueryId(spark: org.apache.spark.sql.SparkSession, checkpoint: String): String = {
    val path = new org.apache.hadoop.fs.Path(checkpoint, "metadata")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var attempts = 0
    while (true) {
      try {
        val in = fs.open(path)
        val body =
          try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
          finally in.close()
        return metadataIdField
          .findFirstMatchIn(body)
          .map(_.group(1))
          .getOrElse(throw new IllegalStateException(s"checkpoint metadata at $path carries no query id: $body"))
      } catch {
        case _: java.io.FileNotFoundException if attempts < 20 =>
          attempts += 1
          Thread.sleep(50)
      }
    }
    sys.error("unreachable")
  }

  /** highest batch id COMMITTED by this process per stream — covers the
    * window where the store commit landed but the watermark write (or the
    * query itself) died: a same-JVM query restart replays that id and this
    * map repairs the watermark instead of double-committing. A fresh
    * process has no entry and probes the durable lineage instead.
    */
  private val inProcessCommitted = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** highest batch id this process STARTED committing per stream, recorded
    * BEFORE the durable write: an interrupt landing between the store commit
    * and the `inProcessCommitted` update leaves mem one behind the durably
    * committed id, and without this marker the retry would skip every
    * durable-confirmation branch and re-commit the batch — the exact crash
    * window the replay guard exists to cover.
    */
  private val inProcessAttempted = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** test hook: simulate a process restart — production code never calls this */
  private[graft] def forgetReplayChecks(): Unit = {
    inProcessCommitted.clear()
    inProcessAttempted.clear()
  }

  /** PRODUCTION pre-write marker (load-bearing — called by `appendBatch`
    * before every durable write; removing it reopens the
    * interrupted-after-commit double-commit window). Exposed `private[graft]`
    * so specs can additionally stage that crash window without a real kill.
    */
  private[graft] def recordAttempt(streamId: String, id: Long): Unit =
    inProcessAttempted.merge(streamId, id, (a, b) => if (a.longValue >= b.longValue) a else b)

  /** One micro-batch → one idempotent append commit. REPLAY guard (a crash
    * between the store commit and the stream's offset commit re-runs the
    * same batch id): fast path = per-stream commit watermark (one file
    * read). The manifest/ledger scan (`hasCommit`) runs only when this batch
    * id may already be committed without a live watermark:
    *  - mem >= id: this process committed it and only the watermark write
    *    was lost (same-JVM query restart);
    *  - mem empty: fresh process — the pre-crash run may have committed;
    *  - attempted >= id while mem < id: this process was interrupted between
    *    the store commit and the committed-map update (mem alone is stale).
    * In steady state (mem = attempted = id-1) none hold and no scan runs.
    * Empty batches advance the watermark without committing a snapshot.
    */
  private[graft] def appendBatch(store: graft.store.TableStore, batch: DataFrame, streamId: String, id: Long): Unit = {
    if (store.streamWatermark(streamId).exists(_ >= id)) return
    val lineage = s"stream-$streamId-batch-$id"
    val mem = Option(inProcessCommitted.get(streamId)).map(_.longValue)
    val attempted = Option(inProcessAttempted.get(streamId)).map(_.longValue)
    val mayBeCommitted = mem.isEmpty || mem.exists(_ >= id) || attempted.exists(_ >= id)
    if (mayBeCommitted && store.hasCommit(lineage)) {
      // the commit already landed — repair the watermark instead of
      // double-committing. The DURABLE lineage must confirm: trusting the
      // in-memory marks alone would drop data after a same-JVM table reset.
      store.setStreamWatermark(streamId, id)
      if (mem.forall(_ < id)) inProcessCommitted.put(streamId, id)
      return
    }
    recordAttempt(streamId, id)
    // persist: isEmpty and the staged write would otherwise each re-execute
    // the micro-batch's full plan
    val b = batch.persist()
    try if (!b.isEmpty) { store.write(graft.store.TierBuilder.withDay(b), "day", lineage, append = true); () }
    finally b.unpersist()
    inProcessCommitted.put(streamId, id)
    store.setStreamWatermark(streamId, id)
  }
}
