package graft.store

import graft.spark.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Round-3 TableStore invariants: manifest-only reads (no raw-dir fallback
  * double counting), legacy entry resolution, atomic concurrent commits,
  * Hive-escaped partition values, and closed directory streams (implicitly —
  * these tests run hundreds of listings in one JVM).
  */
class TableStoreSpec extends SparkTestBase {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_ts").toString

  private def df(days: (String, Int)*) = {
    import spark.implicits._
    days.flatMap { case (d, n) => (0 until n).map(i => (d, i.toLong, i * 1.5)) }
      .toDF("day", "seq", "value")
  }

  test("empty current manifest reads as an EMPTY table, not a raw-dir scan") {
    val base = tmp()
    val store = new TableStore(base, "t")
    store.write(df("2024-01-01" -> 5, "2024-01-02" -> 7), "day", "in-v1")
    // TTL everything away: metadata-only commit with zero partitions
    store.dropPartitionsOlderThan(spark, "day", "2999-01-01", "in-v1")
    val r = store.read(spark)
    assert(r.count() == 0, "dropped-everything table must be empty")
    assert(r.columns.contains("value"), "schema survives via older snapshots")
    // data files still on disk for time travel — must NOT leak into read()
    assert(store.read(spark, 0L).count() == 12)
  }

  test("legacy file-less manifest entry resolves to its partition dir only") {
    val base = tmp()
    val store = new TableStore(base, "t")
    val s0 = store.write(df("2024-01-01" -> 5, "2024-01-02" -> 7), "day", "in-v1")
    // simulate a pre-file-tracking table: strip the file lists from s0's
    // manifest AND the snapshot prefixes from its on-disk files (round-1
    // legacy files were plain part-*.parquet)
    val legacy = s0.copy(partitions = s0.partitions.map(_.copy(files = Seq.empty)))
    Files.writeString(
      Paths.get(s"$base/t/_manifests/snapshot-${"%09d".format(s0.snapshotId)}.json"),
      ManifestJson.render(legacy)
    )
    for (rel <- s0.partitions.flatMap(_.files)) {
      val p = Paths.get(s"$base/t/data/$rel")
      Files.move(p, p.resolveSibling(p.getFileName.toString.replaceFirst("^s\\d{9}-", "")))
    }
    assert(new TableStore(base, "t").read(spark).count() == 12)
    // first post-upgrade commit rewrites one partition; the legacy entry for
    // the OTHER partition must resolve to its dir — and the rewritten one to
    // its new files only (the old whole-dataDir fallback double-counted here)
    val store2 = new TableStore(base, "t")
    store2.write(df("2024-01-02" -> 3), "day", "in-v2", onlyPartitions = Some(Set("2024-01-02")))
    val rows = store2.read(spark).groupBy(col("day").cast("string")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows == Map("2024-01-01" -> 5L, "2024-01-02" -> 3L), s"got $rows")
    // TIME TRAVEL to the legacy snapshot must NOT leak the rewrite's files
    // (they live in the same partition dir under the append-only layout)
    assert(store2.read(spark, s0.snapshotId).count() == 12,
      "legacy snapshot read leaked post-rewrite data")
  }

  test("manifest version compat: pre-terminator bodies parse, truncated v2 prefixes are rejected") {
    val snap = Snapshot(3L, 2L, "in-x", Seq(
      PartitionManifest("2024-01-01", 5L, 11L, Seq("2024-01-01/s000000003-a.parquet")),
      PartitionManifest("2024-01-02", 7L, 22L, Seq("2024-01-02/s000000003-b.parquet"))))
    val v2 = ManifestJson.render(snap)
    assert(v2.startsWith("{\"v\":2,"), "render must lead with the version marker")
    assert(ManifestJson.parse(v2) == snap)
    // intermediate format (count terminator, no version marker) parses strictly
    val v1 = "{" + v2.stripPrefix("{\"v\":2,")
    assert(ManifestJson.parse(v1) == snap)
    // LEGACY format (no marker, no count, body ends in `]}`) — written by
    // pre-terminator builds; rejecting it would wedge every upgraded table
    val legacy = v1.replaceFirst(",\"count\":\\d+\\}$", "}")
    assert(legacy.endsWith("]}") && !legacy.contains("\"count\""))
    assert(ManifestJson.parse(legacy) == snap)
    // a v2 body cut exactly at a partition-object boundary ends in `]}` but
    // still carries the leading marker → rejected, never a silent short parse
    val cut = v2.substring(0, v2.indexOf("]}") + 2)
    assert(cut.endsWith("]}"))
    intercept[IllegalArgumentException](ManifestJson.parse(cut))
    // the SAME cut of a count-era (no marker) or legacy body is rejected by
    // the structural-balance check: the outer object and partitions array
    // are left unclosed — a short parse here would let the next
    // expireSnapshots physically delete the truncated-away partitions' files
    val cutV1 = v1.substring(0, v1.indexOf("]}") + 2)
    intercept[IllegalArgumentException](ManifestJson.parse(cutV1))
    // …while raw brackets inside partition-value STRINGS don't break balance
    val bracketed = ManifestJson.render(snap.copy(partitions =
      snap.partitions.take(1).map(_.copy(partition = "a{b[c"))))
    val bracketedLegacy = ("{" + bracketed.stripPrefix("{\"v\":2,")).replaceFirst(",\"count\":\\d+\\}$", "}")
    assert(ManifestJson.parse(bracketedLegacy).partitions.head.partition == "a{b[c")
    // count/partition mismatch fails loudly
    intercept[IllegalArgumentException](ManifestJson.parse(v2.replaceFirst(""""count":2""", """"count":1""")))
  }

  test("full TTL drop + expiry to ZERO data files still reads as a typed empty table") {
    val base = tmp()
    val store = new TableStore(base, "t")
    store.write(df("2024-01-01" -> 2), "day", "in-1")
    store.write(df("2024-01-02" -> 3), "day", "in-2")
    store.dropPartitionsOlderThan(spark, "day", "2025-01-01", "ttl-all")
    store.expireSnapshots(keepLast = 1)
    // the precondition that used to crash the read: not one parquet remains,
    // so nothing on disk can yield a schema — only the manifest can
    val walked = Files.walk(Paths.get(base))
    val residualParquet =
      try walked.iterator().asScala.count(_.toString.endsWith(".parquet"))
      finally walked.close()
    assert(residualParquet == 0, s"expiry should have deleted every data file, found $residualParquet")
    val empty = store.read(spark)
    assert(empty.count() == 0)
    assert(empty.columns.toSet == Set("day", "seq", "value"),
      s"empty read must keep the table's schema, got ${empty.columns.toSeq}")
    // TYPES too, not just names: the recorded schema is the read-back shape
    // (partition col inferred DATE from the dir values), never void
    assert(empty.schema("day").dataType == org.apache.spark.sql.types.DateType,
      s"day must keep its read-back type, got ${empty.schema("day").dataType}")
    assert(empty.schema("value").dataType == org.apache.spark.sql.types.DoubleType)
    // time travel to the retained (empty) snapshot answers with the same shape
    val sid = store.currentSnapshot.get.snapshotId
    assert(store.read(spark, sid).columns.toSet == Set("day", "seq", "value"))
  }

  test("an all-null-partition delta must not poison the manifest schema with VOID") {
    val s = spark
    import s.implicits._
    val base = tmp()
    val store = new TableStore(base, "t")
    store.write(df("2024-01-01" -> 2), "day", "in-1")
    // append touching ONLY the null partition: the delta's read-back infers
    // the partition column as NullType — reconciliation must keep the
    // parent's type, not record void
    val nullOnly = Seq((Option.empty[String], 9L, 9.0)).toDF("day", "seq", "value")
    store.write(nullOnly, "day", "in-null", append = true)
    val schemaJson = store.currentSnapshot.get.schemaJson.get
    assert(!schemaJson.contains("\"void\"") && !schemaJson.contains("\"null\""),
      s"manifest schema must never record a void field: $schemaJson")
    val st = org.apache.spark.sql.types.DataType.fromJson(schemaJson).asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st("day").dataType == org.apache.spark.sql.types.DateType,
      s"null-only delta must take the parent's day type, got ${st("day").dataType}")
    // a null-only FIRST write (no parent schema): void falls back to string
    val store2 = new TableStore(tmp(), "t2")
    store2.write(nullOnly, "day", "first-null")
    val sj2 = store2.currentSnapshot.get.schemaJson.get
    val st2 = org.apache.spark.sql.types.DataType.fromJson(sj2).asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(st2("day").dataType == org.apache.spark.sql.types.StringType,
      s"null-only first write must record string for the partition col, got ${st2("day").dataType}")
  }

  test("a manifest poisoned with VOID by a pre-reconcile build is healed at the next commit") {
    import org.apache.spark.sql.types.{DataType, NullType, StringType, StructType}
    val s = spark
    import s.implicits._
    def poisonCurrent(base: String, store: TableStore): Unit = {
      // simulate a manifest written by the build that recorded delta
      // schemas verbatim: rewrite the CURRENT snapshot file with day=void
      val cur = store.currentSnapshot.get
      val st = DataType.fromJson(cur.schemaJson.get).asInstanceOf[StructType]
      val voided = StructType(st.fields.map(f => if (f.name == "day") f.copy(dataType = NullType) else f))
      val path = Paths.get(f"$base/t/_manifests/snapshot-${cur.snapshotId}%09d.json")
      Files.writeString(path, ManifestJson.render(cur.copy(schemaJson = Some(voided.json))))
      assert(store.currentSnapshot.get.schemaJson.get.contains("\"void\""), "poisoning precondition")
    }
    // (a) fresh=None parent propagation (metadata-only commit) must sanitize,
    // not copy the poisoned parent schema forward verbatim
    val base1 = tmp()
    val store1 = new TableStore(base1, "t")
    store1.write(df("2024-01-01" -> 2), "day", "in-1")
    poisonCurrent(base1, store1)
    store1.dropPartitionsOlderThan(spark, "day", "2020-01-01", "noop-ttl") // drops nothing, schema=None
    val healed1 = store1.currentSnapshot.get.schemaJson.get
    assert(!healed1.contains("\"void\"") && !healed1.contains("\"null\""),
      s"metadata-only commit must heal a poisoned parent schema: $healed1")
    assert(DataType.fromJson(healed1).asInstanceOf[StructType]("day").dataType == StringType,
      "a poisoned field with no recoverable parent type heals to string")
    // (b) a void fresh field must NOT adopt the parent's field when that
    // field is itself void — the string fallback applies, never NullType
    val base2 = tmp()
    val store2 = new TableStore(base2, "t")
    store2.write(df("2024-01-01" -> 2), "day", "in-1")
    poisonCurrent(base2, store2)
    store2.write(Seq((Option.empty[String], 9L, 9.0)).toDF("day", "seq", "value"), "day", "in-null", append = true)
    val healed2 = store2.currentSnapshot.get.schemaJson.get
    assert(!healed2.contains("\"void\"") && !healed2.contains("\"null\""),
      s"null-only append over a poisoned parent must not re-record void: $healed2")
    assert(DataType.fromJson(healed2).asInstanceOf[StructType]("day").dataType == StringType)
  }

  test("no strict prefix of a rendered manifest parses — truncation at ANY byte is rejected") {
    // the load-bearing guarantee behind the non-link commit fallback: a
    // reader racing a writer (or a crash-truncated file) must never see a
    // valid SHORTER manifest. Exercised for both the v2 format and the
    // legacy (count-less) body the compat path accepts, with partition
    // values containing quotes, backslashes and raw brackets.
    val snap = Snapshot(7L, 6L, "in-\"x\\y", Seq(
      PartitionManifest("2024-01-01", 5L, 11L, Seq("2024-01-01/s000000007-a.parquet")),
      PartitionManifest("a{b[c\"d\\e", 7L, -22L, Seq("p/f1.parquet", "p/f2.parquet")),
      PartitionManifest("z", 0L, 0L, Seq.empty)))
    val v2 = ManifestJson.render(snap)
    assert(ManifestJson.parse(v2) == snap)
    val legacy = ("{" + v2.stripPrefix("{\"v\":2,")).replaceFirst(",\"count\":\\d+\\}$", "}")
    assert(ManifestJson.parse(legacy) == snap)
    // schema-carrying manifest whose schema string ATTACKS the raw-key
    // scanner (embedded "p":/"count":/"partitions": text, quotes,
    // backslashes): q()-escaping must keep every field scan unspoofable,
    // the roundtrip exact, and every strict prefix rejected
    val hostileSchema =
      """{"type":"struct","fields":[{"name":"p\"s\\q","x":"\"p\":1,\"count\":9}","y":"\"partitions\":[]"}]}"""
    val withSchema = snap.copy(schemaJson = Some(hostileSchema))
    val v2s = ManifestJson.render(withSchema)
    assert(ManifestJson.parse(v2s) == withSchema)
    for (doc <- Seq(v2, legacy, v2s); i <- 1 until doc.length)
      assert(scala.util.Try(ManifestJson.parse(doc.substring(0, i))).isFailure,
        s"prefix of length $i parsed as a valid manifest: ${doc.substring(0, i)}")
  }

  test("ledger compaction and hasCommit survive pathological lineage ids") {
    val base = tmp()
    val store = new TableStore(base, "tier_x")
    store.write(df("2024-01-01" -> 1), "day", "seed")
    val ledger = Paths.get(s"$base/tier_x/_manifests/lineage.log")
    // over-Long digit suffix matches the stream regex but overflows toLong:
    // a LEGITIMATE caller-supplied id — equality semantics, never a crash,
    // and compaction (Maintain runs it on every cycle) must not poison on it
    val overLong = "stream-x-batch-99999999999999999999"
    Files.writeString(ledger, s"$overLong\nstream-z-batch-7\nstream-w-batch-007\n")
    assert(store.hasCommit(overLong), "over-Long id answers by equality")
    store.compactLineageLedger()
    assert(store.hasCommit(overLong), "equality coverage preserved across compaction")
    assert(store.hasCommit("stream-z-batch-7"), "well-formed id folded into a range")
    assert(!store.hasCommit("stream-z-batch-8"))
    // leading-zero ids are textually distinct: compaction must not broaden
    // coverage to the numerically-equal canonical spelling (or vice versa)
    assert(store.hasCommit("stream-w-batch-007"), "leading-zero id keeps equality coverage")
    assert(!store.hasCommit("stream-w-batch-7"), "canonical spelling was never committed")
    assert(!store.hasCommit("stream-z-batch-07"), "non-canonical spelling of a ranged id was never committed")
    // idempotent on the pathological content too
    val after = Files.readString(ledger)
    store.compactLineageLedger()
    assert(Files.readString(ledger) == after)
    // a compaction-shaped range line with unparseable numbers is CORRUPTION:
    // silently answering false would green-light a double commit for every
    // id the range used to cover — both readers must fail LOUDLY instead
    Files.writeString(ledger, s"$after#range\tstream-y-batch-\tlo\thi\n")
    intercept[IllegalStateException](store.hasCommit("stream-y-batch-3"))
    intercept[IllegalStateException](store.compactLineageLedger())
  }

  test("append mode merges partition entries; replay guard is queryable") {
    val base = tmp()
    val store = new TableStore(base, "t")
    val s1 = store.write(df("2024-01-01" -> 5), "day", "batch-0", append = true)
    val s2 = store.write(df("2024-01-01" -> 3), "day", "batch-1", append = true)
    val e1 = s1.partitions.head
    val e2 = s2.partitions.head
    assert(e2.rows == 8, "rows must sum")
    assert(e2.files.take(e1.files.size) == e1.files && e2.files.size > e1.files.size,
      "entries must merge (parent files retained + new files appended), not replace")
    assert(store.read(spark).count() == 8)
    // XOR hash composes: compaction of the appended partition is content-identical
    val compacted = store.compactPartition(spark, "day", "2024-01-01").partitions.head
    assert(compacted.contentHash == e2.contentHash && compacted.files.size == 1)
    assert(store.hasCommit("batch-1") && !store.hasCommit("batch-2"))
  }

  test("streaming replay: re-delivered batch id commits exactly once") {
    val s = spark
    import s.implicits._
    val base = tmp()
    val store = new TableStore(base, "tier_x")
    val batch = Seq(("sc", "m", 1700000000L, 1.0), ("sc", "m", 1700000060L, 2.0))
      .toDF("scope", "metric", "bucket", "value")
    graft.streaming.StreamingDerive.appendBatch(store, batch, "q1", 0L)
    val afterFirst = store.read(spark).count()
    assert(afterFirst == 2)
    // crash-replay: foreachBatch re-invokes with the SAME id → no-op
    graft.streaming.StreamingDerive.appendBatch(store, batch, "q1", 0L)
    assert(store.read(spark).count() == 2, "replayed batch double-counted")
    assert(store.snapshots.size == 1, "replay must not add a snapshot")
    // restart-replay with the watermark file REMOVED (cold state, fresh
    // process) still dedupes via the manifest lineage scan, then restores
    // the watermark
    deleteWatermarks(base)
    graft.streaming.StreamingDerive.forgetReplayChecks()
    graft.streaming.StreamingDerive.appendBatch(store, batch, "q1", 0L)
    assert(store.read(spark).count() == 2 && store.streamWatermark("q1").contains(0L))
    // a DIFFERENT stream's batch 0 is NOT confused with q1's
    graft.streaming.StreamingDerive.appendBatch(store, batch, "q2", 0L)
    assert(store.read(spark).count() == 4, "distinct stream must commit")
    // guard survives manifest expiry: compact (new snapshot), expire to 1,
    // then replay q1 batch 0 again — ledger keeps it deduped
    store.compactPartition(spark, "day", store.currentSnapshot.get.partitions.head.partition)
    store.expireSnapshots(keepLast = 1)
    deleteWatermarks(base)
    graft.streaming.StreamingDerive.forgetReplayChecks()
    graft.streaming.StreamingDerive.appendBatch(store, batch, "q1", 0L)
    assert(store.read(spark).count() == 4, "expired-manifest lineage must still dedupe (ledger)")
  }

  test("streaming replay: interrupt between store commit and in-memory mark does not double-commit") {
    val s = spark
    import s.implicits._
    val base = tmp()
    val store = new TableStore(base, "tier_x")
    val b0 = Seq(("sc", "m", 1700000000L, 1.0)).toDF("scope", "metric", "bucket", "value")
    val b1 = Seq(("sc", "m", 1700000060L, 2.0)).toDF("scope", "metric", "bucket", "value")
    graft.streaming.StreamingDerive.forgetReplayChecks()
    graft.streaming.StreamingDerive.appendBatch(store, b0, "qc", 0L)
    assert(store.read(spark).count() == 1)
    // stage the crash window for batch 1: the attempt marker and the DURABLE
    // store commit landed, but the process was interrupted before the
    // committed-map and watermark updates (mem = 0, watermark = 0, store has
    // batch 1). Before the attempt marker existed, the retry saw mem neither
    // >= 1 nor empty, skipped every durable-confirmation branch, and
    // re-committed the batch under the same lineage.
    graft.streaming.StreamingDerive.recordAttempt("qc", 1L)
    store.write(TierBuilder.withDay(b1), "day", "stream-qc-batch-1", append = true)
    assert(store.read(spark).count() == 2)
    // the same-JVM retry of batch 1 must repair the watermark, NOT re-commit
    graft.streaming.StreamingDerive.appendBatch(store, b1, "qc", 1L)
    assert(store.read(spark).count() == 2, "interrupted batch re-committed: rows duplicated")
    assert(store.streamWatermark("qc").contains(1L), "watermark not repaired")
    // and the stream continues normally afterwards (steady state, no probe)
    val b2 = Seq(("sc", "m", 1700000120L, 3.0)).toDF("scope", "metric", "bucket", "value")
    graft.streaming.StreamingDerive.appendBatch(store, b2, "qc", 2L)
    assert(store.read(spark).count() == 3)
    assert(store.streamWatermark("qc").contains(2L))
  }

  test("commit contention stress: 8 writers x 50 metadata commits, no retry bail, ids contiguous") {
    val base = tmp()
    val store = new TableStore(base, "t")
    store.write(df("2024-01-01" -> 3), "day", "seed")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks = (0 until 8).map { t =>
      pool.submit(new Runnable {
        override def run(): Unit =
          // dropPartitionsOlderThan with an always-keep cutoff is a pure
          // metadata commit — max CAS contention, zero Spark jobs
          try for (i <- 0 until 50) store.dropPartitionsOlderThan(spark, "day", "0000", s"stress-$t-$i")
          catch { case e: Throwable => failures.add(e) }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    assert(failures.isEmpty, s"commit stress failed: ${Option(failures.peek()).map(_.toString)}")
    // every commit landed exactly once under backoff: 1 seed + 400 stress
    val ids = store.snapshots.map(_.snapshotId)
    assert(ids.size == 401, s"expected 401 snapshots, got ${ids.size}")
    assert(ids == (0L to 400L), "snapshot ids must be contiguous and unique")
    assert(store.read(spark).count() == 3, "metadata commits must not change data")
  }

  test("lineage ledger compacts to ranges, hasCommit exact across compaction, _manifests bounded") {
    val s = spark
    import s.implicits._
    val base = tmp()
    val store = new TableStore(base, "tier_x")
    def mk(i: Int) =
      Seq(("sc", "m", 1700000000L + i * 60L, i.toDouble)).toDF("scope", "metric", "bucket", "value")
    graft.streaming.StreamingDerive.forgetReplayChecks()
    // N >> keepLast micro-batch commits on one stream, a second stream with a
    // batch-id GAP, and a free-form batch-job commit
    val n = 25
    for (i <- 0 until n) graft.streaming.StreamingDerive.appendBatch(store, mk(i), "s1", i.toLong)
    for (i <- Seq(0L, 1L, 5L)) graft.streaming.StreamingDerive.appendBatch(store, mk(1000 + i.toInt), "s2", i)
    store.write(TierBuilder.withDay(mk(9999)), "day", "batch-job-7", append = true)
    // LAST commit is a streaming one → the kept manifest carries s3's lineage
    graft.streaming.StreamingDerive.appendBatch(store, mk(2000), "s3", 0L)
    // expire to one snapshot → every other commit's lineage rolls into the ledger
    store.expireSnapshots(keepLast = 1)
    store.compactLineageLedger()
    val ledger = Paths.get(s"$base/tier_x/_manifests/lineage.log")
    val lines = Files.readAllLines(ledger).asScala.filter(_.nonEmpty)
    assert(lines.size <= 4, s"ledger not bounded: ${lines.size} lines:\n${lines.mkString("\n")}")
    assert(lines.count(_.startsWith("#range")) >= 2, s"expected range lines, got:\n${lines.mkString("\n")}")
    // coverage EXACTLY preserved: committed ids answer true, gaps/others false
    assert(store.hasCommit("stream-s1-batch-0"))
    assert(store.hasCommit(s"stream-s1-batch-${n - 1}"))
    assert(!store.hasCommit(s"stream-s1-batch-$n"))
    assert(store.hasCommit("stream-s2-batch-1") && store.hasCommit("stream-s2-batch-5"))
    assert(!store.hasCommit("stream-s2-batch-3"), "gap id must stay uncommitted")
    assert(store.hasCommit("batch-job-7"), "free-form batch lineage survives in the ledger")
    assert(!store.hasCommit("batch-job-8"))
    // idempotent: a second compaction changes nothing
    val before = Files.readString(ledger)
    store.compactLineageLedger()
    assert(Files.readString(ledger) == before)
    // watermark GC: liveness = appears in a KEPT manifest. Ledger-only
    // streams (s1, s2 — all their snapshots expired) and never-committed
    // streams ("dead") lose their AGED watermarks — ledger coverage is
    // permanent, so ledger-based liveness would leak one watermark per reset
    // generation forever. s3 (in the kept manifest) survives regardless of
    // age; a fresh mtime would also protect an active stream (not aged here).
    store.setStreamWatermark("dead", 3L)
    val mdir = Paths.get(s"$base/tier_x/_manifests")
    val old = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 8L * 24 * 3600 * 1000L)
    val wms = Files.list(mdir)
    try wms.iterator().asScala.filter(_.getFileName.toString.startsWith("watermark-")).foreach(Files.setLastModifiedTime(_, old))
    finally wms.close()
    val deleted = store.gcStreamWatermarks()
    assert(deleted == 3, s"expected s1+s2+dead watermarks gone, deleted=$deleted")
    assert(store.streamWatermark("s3").contains(0L), "manifest-live stream watermark must survive GC")
    assert(store.streamWatermark("s1").isEmpty && store.streamWatermark("dead").isEmpty)
    // GC is SAFE, not just bounded: a replayed batch of a GC'd stream falls
    // back to the ledger probe and is skipped (watermark repaired, no rows
    // double-committed) — the watermark is a fast path, never the authority
    val rowsBefore = store.read(spark).count()
    graft.streaming.StreamingDerive.forgetReplayChecks()
    graft.streaming.StreamingDerive.appendBatch(store, mk(0), "s1", 0L)
    assert(store.read(spark).count() == rowsBefore, "GC'd watermark must not enable a double commit")
    assert(store.streamWatermark("s1").contains(0L), "replay probe must repair the watermark")
    // _manifests entry count bounded after N >> keepLast commits:
    // keepLast snapshot JSONs + lineage.log + one watermark per LIVE stream
    // (+ s1's just-repaired one)
    val entries = Files.list(mdir)
    val names = try entries.iterator().asScala.map(_.getFileName.toString).toVector finally entries.close()
    assert(names.count(_.startsWith("snapshot-")) == 1, s"snapshots not expired: $names")
    assert(names.size <= 5, s"_manifests unbounded: ${names.size} entries: $names")
  }

  private def deleteWatermarks(base: String): Unit = {
    val dir = java.nio.file.Paths.get(s"$base/tier_x/_manifests")
    val s = java.nio.file.Files.list(dir)
    try s.iterator().asScala.toSeq.filter(_.getFileName.toString.startsWith("watermark-")).foreach(Files.delete)
    finally s.close()
  }

  test("two concurrent streams appending to ONE table: exactly-once, isolated watermarks") {
    val s = spark
    import s.implicits._
    val base = tmp()
    val store = new TableStore(base, "tier_x")
    graft.streaming.StreamingDerive.forgetReplayChecks()
    def mk(tag: Int, i: Int) =
      Seq(("sc", "m", 1700000000L + (tag * 100000 + i) * 60L, i.toDouble)).toDF("scope", "metric", "bucket", "value")
    val n = 20
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("sA" -> 1, "sB" -> 2).map { case (sid, tag) =>
      new Thread(() =>
        try for (i <- 0 until n) graft.streaming.StreamingDerive.appendBatch(store, mk(tag, i), sid, i.toLong)
        catch { case e: Throwable => failures.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"concurrent stream appends failed: ${Option(failures.peek()).map(_.toString)}")
    // exactly-once per stream: every batch's lineage committed, rows add up,
    // per-stream watermarks isolated at their own high-water mark
    assert(store.read(spark).count() == 2L * n, "each batch's single row lands exactly once")
    for (sid <- Seq("sA", "sB")) {
      assert(store.streamWatermark(sid).contains((n - 1).toLong), s"$sid watermark")
      for (i <- 0 until n) assert(store.hasCommit(s"stream-$sid-batch-$i"), s"$sid batch $i")
    }
    // a replay on either stream after the interleaving is still skipped
    graft.streaming.StreamingDerive.appendBatch(store, mk(1, 0), "sA", 0L)
    assert(store.read(spark).count() == 2L * n, "replay must not double-commit")
  }

  test("a FAILED staging write leaks no .stage-* directory") {
    val base = tmp()
    val store = new TableStore(base, "t")
    val boom = org.apache.spark.sql.functions.udf((i: Long) => {
      if (i >= 0) throw new RuntimeException("boom"); i
    })
    import spark.implicits._
    val bad = df("2024-01-01" -> 4).withColumn("seq", boom(col("seq")))
    intercept[Exception] { store.write(bad, "day", "in-v1") }
    val tDir = java.nio.file.Paths.get(s"$base/t")
    if (Files.isDirectory(tDir)) {
      val leftovers = java.nio.file.Files.list(tDir)
      try assert(!leftovers.iterator().asScala.exists(_.getFileName.toString.startsWith(".stage-")),
        "stage dir leaked after failed write")
      finally leftovers.close()
    }
    // and the table remains writable afterwards
    store.write(df("2024-01-01" -> 2), "day", "in-v2")
    assert(store.read(spark).count() == 2)
  }

  test("concurrent commits: both writers' partitions survive, ids unique") {
    val base = tmp()
    val store = new TableStore(base, "t")
    store.write(df("2024-01-01" -> 2), "day", "in-v0")
    val frames = (0 until 4).map(i => df(f"2024-02-$i%02d" -> (i + 1)))
    val threads = frames.zipWithIndex.map { case (f, i) =>
      new Thread(() => new TableStore(base, "t").write(f, "day", s"in-$i"))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val snaps = new TableStore(base, "t").snapshots
    assert(snaps.map(_.snapshotId) == snaps.map(_.snapshotId).distinct, "snapshot ids unique")
    assert(snaps.size == 5, s"one manifest per commit, got ${snaps.size}")
    val finalParts = snaps.last.partitions.map(_.partition).toSet
    assert(finalParts == Set("2024-01-01", "2024-02-00", "2024-02-01", "2024-02-02", "2024-02-03"),
      s"no committer's partitions were dropped: $finalParts")
    assert(new TableStore(base, "t").read(spark).count() == 2 + 1 + 2 + 3 + 4)
  }

  test("partition values needing Hive path escaping commit and read back") {
    val base = tmp()
    val store = new TableStore(base, "t")
    import spark.implicits._
    val data = Seq(("a b:c=d", 1.0), ("plain", 2.0), ("a b:c=d", 3.0)).toDF("k", "value")
    val snap = store.write(data, "k", "in-v1")
    // manifest keys are the RAW values, not the %xx-escaped dir names
    assert(snap.partitions.map(_.partition).toSet == Set("a b:c=d", "plain"))
    val back = store.read(spark).groupBy("k").agg(sum("value").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(back == Map("a b:c=d" -> 4.0, "plain" -> 2.0))
    assert(store.partitionFileCount("k", "a b:c=d") >= 1)
    // rewrite the escaped partition: entry replaced, not duplicated
    store.write(Seq(("a b:c=d", 9.0)).toDF("k", "value"), "k", "in-v2", onlyPartitions = Some(Set("a b:c=d")))
    val after = store.read(spark).groupBy("k").agg(sum("value").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after == Map("a b:c=d" -> 9.0, "plain" -> 2.0))
  }

  test("maintenance lock: a live holder excludes every maintenance op; a stale lock is stolen") {
    val base = tmp()
    val store = new TableStore(base, "tier_x")
    store.write(df("2024-01-01" -> 2), "day", "stream-q-batch-0", append = true)
    store.write(df("2024-01-01" -> 1), "day", "stream-q-batch-1", append = true)
    val lock = Paths.get(s"$base/tier_x/_manifests/maintenance.lock")
    // simulate a concurrent maintainer in another process: a LIVE lease file
    Files.writeString(lock, "pid=99999 op=expireSnapshots nonce=other")
    intercept[MaintenanceLockHeld](store.expireSnapshots(keepLast = 1))
    intercept[MaintenanceLockHeld](store.compactLineageLedger())
    intercept[MaintenanceLockHeld](store.gcStreamWatermarks())
    assert(store.snapshots.size == 2, "locked-out expiry must not have touched manifests")
    assert(Files.readString(lock) == "pid=99999 op=expireSnapshots nonce=other",
      "a locked-out maintainer must not disturb the holder's lease")
    // crashed holder: age the lease past the TTL → next maintainer steals it,
    // runs, and releases (no lease left behind)
    val stale = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - TableStore.DefaultMaintenanceLockTtlMs - 60000L)
    Files.setLastModifiedTime(lock, stale)
    assert(store.expireSnapshots(keepLast = 1) >= 0)
    assert(store.snapshots.size == 1, "stolen-lease expiry must run")
    assert(!Files.exists(lock), "lease must be released after the op")
    assert(store.hasCommit("stream-q-batch-0"), "expired lineage rolled into the ledger")
    // a holder that overran its TTL and was superseded must NOT delete the
    // superseder's lease on release: simulated by the content check
    Files.writeString(lock, "pid=1 op=x nonce=superseder")
    Files.setLastModifiedTime(lock, stale)
    store.compactLineageLedger() // steals, runs, releases its OWN lease
    assert(!Files.exists(lock))
  }

  test("hostile generation state cannot wedge acquisition or regress the counter") {
    val base = tmp()
    val store = new TableStore(base, "tier_x")
    store.write(df("2024-01-01" -> 2), "day", "stream-q-batch-0", append = true)
    val mdir = Paths.get(s"$base/tier_x/_manifests")
    val lock = mdir.resolve("maintenance.lock")
    // squatters on marker names: a non-empty DIRECTORY named like a marker
    // (counts toward the max by name — claims land above it, never inside
    // it) and an unparseable marker name (ignored). The old single-file
    // design could be wedged by a directory squatting the write target;
    // write-once markers just claim the next free number.
    Files.createDirectories(mdir.resolve("maintenance.gen-7").resolve("x"))
    Files.writeString(mdir.resolve("maintenance.gen-notanumber"), "")
    assert(store.expireSnapshots(keepLast = 1) >= 0)
    assert(!Files.exists(lock), "lease released after the op")
    val listing = Files.list(mdir)
    val markers =
      try listing.iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("maintenance.gen-")).toSet
      finally listing.close()
    assert(markers.contains("maintenance.gen-8"), s"claim must land above the squatting 7: $markers")
    // GC's deleteIfExists on the non-empty squatter dir throws — swallowed
    // per-file, never fatal; the unparseable name is outside the protocol
    // and must not be touched at all
    assert(markers.contains("maintenance.gen-notanumber"), s"unparseable names must be left alone: $markers")
  }

  test("concurrent maintenance acquisitions claim strictly unique generations") {
    // stresses the claim path itself: CREATE_NEW marker races between
    // threads claiming at the same instant, plus the post-create max
    // re-check. Every successful acquisition must carry a generation no
    // other acquisition ever carried — a duplicate would un-fence the
    // ledger rewrite (see the fencing scaladoc).
    val base = tmp()
    val store = new TableStore(base, "tier_cg")
    store.write(df("2024-01-01" -> 1), "day", "stream-cg-batch-0", append = true)
    val lock = Paths.get(s"$base/tier_cg/_manifests/maintenance.lock")
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // the hook fires inside assertLeaseHeld while THIS thread holds the
    // lease, so the body read is always the reader's own
    store.leaseCheckHook = _ => bodies.add(Files.readString(lock))
    val perThread = 5
    val threads = (0 until 8).map { _ =>
      new Thread(() => {
        var done = 0
        while (done < perThread) {
          try { store.gcStreamWatermarks(maxAgeMs = Long.MaxValue); done += 1 }
          catch { case _: MaintenanceLockHeld => Thread.sleep(2) } // contended — retry
        }
      })
    }
    try {
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(threads.forall(!_.isAlive), "acquisition stress did not complete in time")
    } finally store.leaseCheckHook = _ => ()
    val byNonce = bodies.toArray(Array.empty[String]).toSeq
      .map { b =>
        val kv = b.split(' ').map(s => s.span(_ != '=')).map { case (k, v) => k -> v.drop(1) }.toMap
        kv("nonce") -> kv("gen").toLong
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    assert(byNonce.size == 8 * perThread, s"expected ${8 * perThread} successful acquisitions, saw ${byNonce.size}")
    assert(byNonce.values.forall(_.size == 1), "one lease observed under two generations")
    val gens = byNonce.values.map(_.head).toSeq
    assert(gens.distinct.size == gens.size, s"DUPLICATE generations claimed concurrently: ${gens.sorted}")
  }

  test("a stale lock whose generation has NO marker (stall-before-persist zombie) is never duplicated") {
    val base = tmp()
    val store = new TableStore(base, "tier_x", maintenanceLockTtlMs = 50L)
    store.write(df("2024-01-01" -> 2), "day", "stream-q-batch-0", append = true)
    store.expireSnapshots(keepLast = 10) // rolls nothing, claims gen 1
    val mdir = Paths.get(s"$base/tier_x/_manifests")
    val lock = mdir.resolve("maintenance.lock")
    // the hazard the marker design closes: a holder wrote its lock (gen=7
    // embedded) but died before any separate persist made 7 visible — under
    // the single-file design a stealer re-read the stale counter and claimed
    // 7 AGAIN, un-fencing the zombie's staged ledger rewrite. No marker 7
    // exists here, exactly as that zombie would leave the world.
    Files.writeString(lock, "pid=1 op=x gen=7 nonce=zombie")
    Files.setLastModifiedTime(lock, java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 60000))
    var seenBody = ""
    store.leaseCheckHook = _ => seenBody = Files.readString(lock)
    try store.gcStreamWatermarks(maxAgeMs = Long.MaxValue) // steals the stale lock
    finally store.leaseCheckHook = _ => ()
    // the successor's claim must land ABOVE the zombie's observed body gen,
    // marker or no marker: its sweep fences .tmp-ledger-g7-* as stale
    assert(seenBody.contains("gen=8"), s"successor must claim above the marker-less zombie's 7: $seenBody")
    assert(!Files.exists(lock))
  }

  test("zombie holder: a lease stolen mid-op aborts at the pre-mutation re-verify, writing NOTHING") {
    val base = tmp()
    val store = new TableStore(base, "tier_x")
    store.write(df("2024-01-01" -> 2), "day", "stream-q-batch-0", append = true)
    store.write(df("2024-01-01" -> 1), "day", "stream-q-batch-1", append = true)
    val mdir = Paths.get(s"$base/tier_x/_manifests")
    val lock = mdir.resolve("maintenance.lock")
    val ledger = mdir.resolve("lineage.log")
    // pause hook: at the instant of the pre-mutation re-verify, replace the
    // lease with a superseder's — exactly what a holder GC-paused past the
    // TTL observes when it resumes (its lease was stolen and re-claimed)
    def installSteal(): Unit = store.leaseCheckHook = _ =>
      Files.writeString(lock, "pid=2 op=maintain nonce=superseder")
    def reset(): Unit = { store.leaseCheckHook = _ => (); Files.deleteIfExists(lock) }
    def tmpLedgers() = {
      val s = Files.list(mdir)
      try s.iterator().asScala.map(_.getFileName.toString).filter(_.startsWith(".tmp-ledger-")).toList
      finally s.close()
    }

    // --- expireSnapshots: displaced holder aborts BEFORE the ledger append
    installSteal()
    intercept[MaintenanceLockHeld](store.expireSnapshots(keepLast = 1))
    assert(!Files.exists(ledger), "displaced expiry must not have appended to the ledger")
    assert(store.snapshots.size == 2, "displaced expiry must not have deleted a manifest")
    assert(Files.readString(lock).contains("superseder"), "the superseder's lease must survive the abort")
    reset()
    // healthy expiry (seeds the ledger for the compaction leg)
    store.expireSnapshots(keepLast = 1)
    assert(Files.exists(ledger) && store.snapshots.size == 1)
    val ledgerBefore = Files.readString(ledger)

    // --- compactLineageLedger: displaced holder aborts BEFORE the rewrite
    installSteal()
    intercept[MaintenanceLockHeld](store.compactLineageLedger())
    assert(Files.readString(ledger) == ledgerBefore, "displaced compaction must not rewrite the ledger")
    assert(tmpLedgers().isEmpty, "the aborted rewrite must clean up its tmp file")
    reset()

    // --- gcStreamWatermarks: displaced holder aborts BEFORE the delete sweep
    store.setStreamWatermark("deadstream", 5L)
    val wm = {
      val s = Files.list(mdir)
      try s.iterator().asScala.filter(_.getFileName.toString.startsWith("watermark-")).toList.head
      finally s.close()
    }
    Files.setLastModifiedTime(wm, java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000L))
    installSteal()
    intercept[MaintenanceLockHeld](store.gcStreamWatermarks(maxAgeMs = 1L))
    assert(Files.exists(wm), "displaced GC must not have deleted a watermark")
    reset()
    // the healthy run deletes it (proves the abort, not the setup, protected it)
    assert(store.gcStreamWatermarks(maxAgeMs = 1L) == 1)
    assert(!Files.exists(wm))
  }

  test("nested withMaintenanceLock on the same thread fails FAST, and the outer lease still releases") {
    // a nested acquisition could never succeed (our own live lock reads as
    // held), but its finally would null the ThreadLocal lease body and break
    // the OUTER op's later assertLeaseHeld — the guard makes the misuse loud
    // at the nested call site instead
    val base = tmp()
    val store = new TableStore(base, "tier_nest")
    store.write(df("2024-01-01" -> 1), "day", "stream-n-batch-0", append = true)
    val lock = Paths.get(s"$base/tier_nest/_manifests/maintenance.lock")
    store.leaseCheckHook = _ => store.compactLineageLedger() // nested acquisition on the SAME thread
    try {
      val e = intercept[IllegalArgumentException](store.gcStreamWatermarks(maxAgeMs = 1L))
      assert(e.getMessage.contains("nested withMaintenanceLock"), e.getMessage)
    } finally store.leaseCheckHook = _ => ()
    assert(!Files.exists(lock), "the outer holder's abort must still release its lease")
    store.gcStreamWatermarks(maxAgeMs = Long.MaxValue) // and the next op acquires cleanly
  }

  test("same-instance cross-thread steal: the zombie compares ITS OWN lease body, not the new holder's") {
    // the lease body is ThreadLocal: with an instance-level field, thread B's
    // steal+re-acquire on the SAME TableStore instance would overwrite the
    // paused thread A's view, so A's re-verify would compare B's body against
    // B's lock file, PASS, and write over B's live state — and B would later
    // crash on A's cleanup with the wrong exception
    val base = tmp()
    val store = new TableStore(base, "tier_tl")
    store.write(df("2024-01-01" -> 2), "day", "stream-tl-batch-0", append = true)
    store.write(df("2024-01-01" -> 1), "day", "stream-tl-batch-1", append = true)
    val mdir = Paths.get(s"$base/tier_tl/_manifests")
    val lock = mdir.resolve("maintenance.lock")
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile var bFailure: Option[Throwable] = None
    store.leaseCheckHook = _ =>
      if (fired.compareAndSet(false, true)) {
        // thread A (the future zombie) is paused here pre-mutation; thread B
        // on the SAME instance observes A's lease as TTL-stale, steals it,
        // runs a full maintenance op, and releases — all before A resumes
        val b = new Thread(() =>
          try {
            Files.setLastModifiedTime(
              lock,
              java.nio.file.attribute.FileTime.fromMillis(
                System.currentTimeMillis() - TableStore.DefaultMaintenanceLockTtlMs - 60000L
              )
            )
            store.expireSnapshots(keepLast = 5) // keeps everything; just exercises the lease
          } catch { case t: Throwable => bFailure = Some(t) }
        )
        b.start()
        b.join(60000)
      }
    try {
      // A must abort with MaintenanceLockHeld (its OWN body no longer on the
      // file), never IllegalStateException (the instance-field failure mode)
      intercept[MaintenanceLockHeld](store.expireSnapshots(keepLast = 1))
    } finally store.leaseCheckHook = _ => ()
    assert(bFailure.isEmpty, s"the stealing thread must complete cleanly: $bFailure")
    assert(store.snapshots.size == 2, "the displaced zombie must not have expired anything")
  }

  test("stale-lock steal: confirmed body is removed; a changed lease is RESTORED, never destroyed") {
    val base = tmp()
    val store = new TableStore(base, "tier_x")
    store.write(df("2024-01-01" -> 1), "day", "seed")
    val lock = Paths.get(s"$base/tier_x/_manifests/maintenance.lock")
    val mdir = lock.getParent
    def graves() = {
      val s = Files.list(mdir)
      try { val it = s.iterator(); val b = Seq.newBuilder[String]; while (it.hasNext) { val n = it.next().getFileName.toString; if (n.startsWith(".stale-lock-")) b += n }; b.result() }
      finally s.close()
    }
    val aged = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - TableStore.DefaultMaintenanceLockTtlMs - 60000L)
    // CONFIRMED steal: the instance still carries the observed body AND is
    // still stale at the last-instant re-verify → removed, path free, no
    // grave residue
    Files.writeString(lock, "pid=1 op=x nonce=crashed")
    Files.setLastModifiedTime(lock, aged)
    store.stealStaleLock("pid=1 op=x nonce=crashed")
    assert(!Files.exists(lock) && graves().isEmpty)
    // BODY CHANGED (the delayed-stealer race, staged deterministically):
    // the lock now holds a FRESH lease whose body differs from what this
    // stealer observed before being delayed — rejected BEFORE the rename:
    // lock untouched, no grave, reported held. (The post-move restore
    // branch behind this check is defense-in-depth for a replacement
    // landing inside the re-check→rename microseconds — not deterministically
    // reachable from a test.)
    Files.writeString(lock, "pid=2 op=y nonce=fresh-holder")
    Files.setLastModifiedTime(lock, aged)
    intercept[MaintenanceLockHeld](store.stealStaleLock("pid=1 op=x nonce=crashed"))
    assert(Files.readString(lock) == "pid=2 op=y nonce=fresh-holder",
      "a lease that changed under the steal must be left untouched")
    assert(graves().isEmpty, "rejected steal must not leave a grave")
    // NO LONGER STALE (same body, fresh mtime — e.g. the clock was wrong):
    // also rejected pre-move
    Files.writeString(lock, "pid=1 op=x nonce=crashed")
    intercept[MaintenanceLockHeld](store.stealStaleLock("pid=1 op=x nonce=crashed"))
    assert(Files.exists(lock) && graves().isEmpty)
    // lost race (no lock at all): a no-op, caller loops
    Files.delete(lock)
    store.stealStaleLock("whatever")
    assert(!Files.exists(lock))
  }

  test("concurrent maintenance + streaming-shaped commits: no ledger append is ever lost") {
    val base = tmp()
    val store = new TableStore(base, "tier_x")
    store.write(df("2024-01-01" -> 1), "day", "seed")
    val n = 60
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // committer: metadata-only commits with stream-shaped lineage ids (the
    // ledger folds them into ranges — exactly the lines a lost append would
    // silently drop)
    val committer = new Thread(() =>
      try for (i <- 0 until n) store.dropPartitionsOlderThan(spark, "day", "0000", s"stream-cc-batch-$i")
      catch { case e: Throwable => failures.add(e) })
    // two maintainers racing each other AND the committer: without the lease
    // an expiry append interleaving a compaction rewrite loses lines; with
    // it, contention surfaces ONLY as MaintenanceLockHeld (skipped cycle)
    val maintainers = (0 until 2).map(_ =>
      new Thread(() =>
        try for (_ <- 0 until 25) {
          try { store.expireSnapshots(keepLast = 1); store.compactLineageLedger(); () }
          catch { case _: MaintenanceLockHeld => () }
        } catch { case e: Throwable => failures.add(e) }))
    (committer +: maintainers).foreach(_.start())
    (committer +: maintainers).foreach(_.join())
    assert(failures.isEmpty, s"concurrent maintenance failed: ${Option(failures.peek()).map(_.toString)}")
    // roll every remaining manifest's lineage into the ledger, then verify
    // EVERY committed id still answers true — a single lost append here is
    // a green light for a streaming double commit on replay
    try store.expireSnapshots(keepLast = 1)
    catch { case _: MaintenanceLockHeld => fail("no maintainer is live — lease must be free") }
    for (i <- 0 until n)
      assert(store.hasCommit(s"stream-cc-batch-$i"), s"ledger lost the append for batch $i")
    assert(store.hasCommit("seed") && !store.hasCommit(s"stream-cc-batch-$n"))
  }

  test("onlyPartitions selects the NULL partition via its __HIVE_DEFAULT_PARTITION__ manifest key (resume path)") {
    val s = spark
    import s.implicits._
    val base = tmp()
    val store = new TableStore(base, "t")
    val nullKey = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    def mixed = Seq((Option("2024-01-01"), 1.0), (Option("2024-01-01"), 2.0), (Option.empty[String], 9.0))
      .toDF("day", "value")
    val s0 = store.write(mixed, "day", "in-v1")
    assert(s0.partitions.map(_.partition).toSet == Set("2024-01-01", nullKey))
    // resume targeting ONLY the null partition: isin(null) evaluates to
    // NULL and silently drops the rows — the filter must map the manifest
    // key back to IS NULL, or the partition is never written on resume
    val s1 = store.write(mixed.where(col("day").isNull), "day", "in-v2", onlyPartitions = Some(Set(nullKey)))
    val nullEntry = s1.partitions.find(_.partition == nullKey).get
    assert(nullEntry.rows == 1, s"null partition must carry its row after a targeted rewrite: $s1")
    // mixed selection (null + real) also lands both
    store.write(mixed, "day", "in-v3", onlyPartitions = Some(Set(nullKey, "2024-01-01")))
    val back = store.read(spark).agg(sum("value")).collect()(0).getDouble(0)
    assert(back == 12.0, s"all rows of both partitions must read back, got $back")
  }

  test("the NULL partition compacts (found by the store fuzz: only-null partition-type inference is VOID)") {
    val s = spark
    import s.implicits._
    val base = tmp()
    val store = new TableStore(base, "t")
    val nullKey = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    def batch(v: Double) = Seq((Option.empty[String], v), (Option.empty[String], v + 1)).toDF("day", "value")
    store.write(batch(0), "day", "in-0")
    for (i <- 1 to 3) store.write(batch(i * 10.0), "day", s"in-$i", append = true)
    assert(store.partitionFileCount("day", nullKey) >= 4, "need a fragmented null partition")
    val before = store.currentSnapshot.get.partitions.find(_.partition == nullKey).get
    // pre-fix: partition-type inference over only-null dir values yields
    // VOID and the partitionBy rewrite threw INVALID_PARTITION_COLUMN_DATA_TYPE
    // — Maintain.run would crash compacting a fragmented null-day partition
    val snap = store.compactPartition(spark, "day", nullKey)
    val after = snap.partitions.find(_.partition == nullKey).get
    assert(store.partitionFileCount("day", nullKey) == 1)
    assert(after.rows == before.rows && after.contentHash == before.contentHash,
      "null-partition compaction must be content-identical (rows + hash)")
    assert(store.read(spark).agg(sum("value")).head.getDouble(0) == 0 + 1 + 10 + 11 + 20 + 21 + 30 + 31)
  }

  test("expireSnapshots minSnapshotAgeMs: young snapshots survive beyond keepLast (reader grace)") {
    val base = tmp()
    val store = new TableStore(base, "t")
    store.write(df("2024-01-01" -> 1), "day", "in-v1")
    store.write(df("2024-01-01" -> 1), "day", "in-v2", onlyPartitions = Some(Set("2024-01-01")))
    store.write(df("2024-01-01" -> 1), "day", "in-v3", onlyPartitions = Some(Set("2024-01-01")))
    // all three manifests are seconds old: with a 1h grace, keepLast=1
    // expires NOTHING — a long-running reader's resolved snapshot survives
    assert(store.expireSnapshots(keepLast = 1, minSnapshotAgeMs = 3600 * 1000L) == 0)
    assert(store.snapshots.size == 3, "young snapshots must survive count-based expiry under the grace")
    // age the two oldest manifests past the grace → they expire, newest stays
    val old = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 2L * 3600 * 1000)
    for (id <- Seq(0L, 1L))
      Files.setLastModifiedTime(Paths.get(f"$base/t/_manifests/snapshot-$id%09d.json"), old)
    assert(store.expireSnapshots(keepLast = 1, minSnapshotAgeMs = 3600 * 1000L) > 0)
    assert(store.snapshots.map(_.snapshotId) == Seq(2L))
    assert(store.read(spark).count() == 1)
  }

  test("expiry sweeps a crashed writer's aged .stage-* directory, never a fresh one") {
    val base = tmp()
    val store = new TableStore(base, "t")
    store.write(df("2024-01-01" -> 1), "day", "in-v1")
    // a crashed writer's leftover staged copy (directory + nested file)
    val stale = Paths.get(s"$base/t/.stage-9-dead")
    Files.createDirectories(stale.resolve("day=2024-01-01"))
    Files.writeString(stale.resolve("day=2024-01-01/part-0.parquet"), "x")
    val fresh = Paths.get(s"$base/t/.stage-9-live")
    Files.createDirectories(fresh)
    // a LONG-RUNNING live write: the root dir mtime aged past the gate
    // (dir mtimes refresh only on direct-child create/delete) while its
    // leaf part-file is still being written — must NEVER be swept
    val longRun = Paths.get(s"$base/t/.stage-9-longrun")
    Files.createDirectories(longRun.resolve("day=2024-01-02"))
    Files.writeString(longRun.resolve("day=2024-01-02/part-0.parquet"), "still-writing")
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - TableStore.DefaultOrphanFileGateMs - 3600 * 1000L)
    // crashed writer: EVERYTHING under the dir stopped aging together
    Files.setLastModifiedTime(stale.resolve("day=2024-01-01/part-0.parquet"), old)
    Files.setLastModifiedTime(stale.resolve("day=2024-01-01"), old)
    Files.setLastModifiedTime(stale, old)
    // long-running writer: root + subdir aged, leaf fresh (default mtime)
    Files.setLastModifiedTime(longRun.resolve("day=2024-01-02"), old)
    Files.setLastModifiedTime(longRun, old)
    store.expireSnapshots(keepLast = 1)
    assert(!Files.exists(stale), "aged stage dir (crashed writer) must be swept recursively")
    assert(Files.exists(fresh), "a live writer's fresh stage dir must survive")
    assert(Files.exists(longRun.resolve("day=2024-01-02/part-0.parquet")),
      "a stage dir with ANY fresh leaf is a live long-running write, not an orphan")
  }

  test("expiry reclaims expired-manifest files immediately but never a FRESH unreferenced file (in-flight commit)") {
    val base = tmp()
    val store = new TableStore(base, "t")
    store.write(df("2024-01-01" -> 2), "day", "in-v1")
    store.write(df("2024-01-01" -> 1), "day", "in-v2", onlyPartitions = Some(Set("2024-01-01")))
    // plant a fresh s-prefixed UNREFERENCED file — exactly what a live
    // writer's moveStaged leaves in dataDir during the moveStaged →
    // hashFiles → commit window; deleting it would let that commit land
    // referencing dead files (silent data loss)
    val partDir = Paths.get(s"$base/t/data/day=2024-01-01")
    val inflight = partDir.resolve("s000000099-inflight.parquet")
    Files.writeString(inflight, "in-flight-placeholder")
    val reclaimed = store.expireSnapshots(keepLast = 1)
    assert(reclaimed >= 1, "the expired snapshot's replaced files must be reclaimed immediately (known-dead provenance)")
    assert(Files.exists(inflight), "a fresh unreferenced file is an in-flight commit, not garbage")
    // once aged past the orphan gate (a crashed writer), the next cycle reclaims it
    Files.setLastModifiedTime(inflight,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - TableStore.DefaultOrphanFileGateMs - 3600 * 1000L))
    store.expireSnapshots(keepLast = 1)
    assert(!Files.exists(inflight), "aged orphans must be reclaimed")
    assert(store.read(spark).count() == 1, "manifest-resolved reads are unaffected throughout")
  }

  test("commit rejects lineage ids that would corrupt the ledger line grammar") {
    val base = tmp()
    val store = new TableStore(base, "t")
    // a tab-bearing id could collide with the '#range\t' namespace once
    // expired into the ledger (wedging hasCommit forever); a newline splits
    // into lines that never answer true (silent double commit). Both are
    // rejected AT COMMIT — the only door into the system.
    for (bad <- Seq("a\tb", "#range\tstream-x-batch-\t1\t2", "a\nb", "a\rb"))
      intercept[IllegalArgumentException](store.write(df("2024-01-01" -> 1), "day", bad))
    assert(store.snapshots.isEmpty, "rejected commits must not land")
    // '#range' WITHOUT a tab can never collide (the marker includes the tab)
    store.write(df("2024-01-01" -> 1), "day", "#range-looking-id")
    store.write(df("2024-01-02" -> 1), "day", "next")
    store.expireSnapshots(keepLast = 1)
    assert(store.hasCommit("#range-looking-id"))
  }

  test("compaction aborts when the partition changed under it (validation)") {
    val base = tmp()
    val store = new TableStore(base, "t")
    val s0 = store.write(df("2024-01-01" -> 4), "day", "in-v1")
    // another committer rewrites the partition between our read and commit:
    // simulate by rewriting first, then compacting from the STALE store view
    val stale = s0.partitions.head
    store.write(df("2024-01-01" -> 2), "day", "in-v2", onlyPartitions = Some(Set("2024-01-01")))
    // a fresh compaction against current state is fine
    store.compactPartition(spark, "day", "2024-01-01", targetFiles = 1)
    assert(store.read(spark).count() == 2)
    assert(stale.files.nonEmpty) // stale view retained (sanity)
  }

  test("lease generations are monotonic, persisted, and embedded in the lock body") {
    val base = tmp()
    val store = new TableStore(base, "tier_gen")
    store.write(df("2024-01-01" -> 1), "day", "stream-g-batch-0", append = true)
    val mdir = Paths.get(s"$base/tier_gen/_manifests")
    val lock = mdir.resolve("maintenance.lock")
    def markers: Set[Long] = {
      val listing = Files.list(mdir)
      try listing.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("maintenance.gen-")).map(_.stripPrefix("maintenance.gen-").toLong).toSet
      finally listing.close()
    }
    var seenBody = ""
    store.leaseCheckHook = _ => seenBody = Files.readString(lock)
    try {
      store.gcStreamWatermarks(maxAgeMs = Long.MaxValue)
      assert(markers == Set(1L), s"first acquisition claims marker 1, found $markers")
      assert(seenBody.contains("gen=1"), s"lock body must carry its generation: $seenBody")
      store.gcStreamWatermarks(maxAgeMs = Long.MaxValue)
      assert(markers == Set(2L), s"second acquisition claims marker 2 and GCs marker 1, found $markers")
      assert(seenBody.contains("gen=2"), s"lock body must carry its generation: $seenBody")
      // a legacy single-file generation record (earlier round-7 binaries)
      // is a read-only FLOOR: the next claim lands strictly above it
      Files.writeString(mdir.resolve("maintenance.generation"), "41")
      store.gcStreamWatermarks(maxAgeMs = Long.MaxValue)
      assert(markers == Set(42L), s"claim must bump past the legacy file's 41, found $markers")
      assert(seenBody.contains("gen=42"), s"lock body must carry its generation: $seenBody")
    } finally store.leaseCheckHook = _ => ()
    // the parser behind the acquisition sweep: versioned names carry their
    // generation; the legacy unversioned form always reads stale (0)
    assert(store.stagedLedgerGen(".tmp-ledger-g7-abc") == 7L)
    assert(store.stagedLedgerGen(".tmp-ledger-g123-x-y") == 123L)
    assert(store.stagedLedgerGen(".tmp-ledger-0b9f4e") == 0L)
    assert(store.stagedLedgerGen(".tmp-ledger-gnotanumber") == 0L)
  }

  test("generation fencing: a displaced holder's staged ledger move is REJECTED inside the re-verify→move window") {
    val base = tmp()
    val store = new TableStore(base, "tier_fence")
    store.write(df("2024-01-01" -> 2), "day", "stream-q-batch-0", append = true)
    store.write(df("2024-01-01" -> 1), "day", "stream-q-batch-1", append = true)
    store.expireSnapshots(keepLast = 1) // gen 1 — seeds the ledger
    val mdir = Paths.get(s"$base/tier_fence/_manifests")
    val ledger = mdir.resolve("lineage.log")
    val ledgerBefore = Files.readString(ledger)
    assert(ledgerBefore.nonEmpty)
    // the zombie: a compaction paused AFTER its pre-move re-verify passed
    // (the window assertLeaseHeld cannot cover). While paused, a successor
    // (ttl 0 = the zombie's lease reads stale) acquires — its acquisition
    // sweep invalidates the zombie's staged rewrite — and appends a fresh
    // ledger line the zombie's stale rewrite does not contain.
    val successor = new TableStore(base, "tier_fence", maintenanceLockTtlMs = 0L)
    store.ledgerMoveHook = () => {
      successor.gcStreamWatermarks(maxAgeMs = Long.MaxValue) // steals, claims gen 3, sweeps gen<3
      Files.writeString(
        ledger, "stream-fresh-batch-9\n",
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND
      )
    }
    try {
      val e = intercept[MaintenanceLockHeld](store.compactLineageLedger())
      assert(e.getMessage.contains("invalidated by a newer lease generation"), e.getMessage)
    } finally store.ledgerMoveHook = () => ()
    val after = Files.readString(ledger)
    assert(after == ledgerBefore + "stream-fresh-batch-9\n", s"the successor's append must survive the zombie: [$after]")
    // and a healthy later compaction preserves BOTH coverages
    store.compactLineageLedger()
    assert(store.hasCommit("stream-q-batch-0") && store.hasCommit("stream-q-batch-1"))
    assert(store.hasCommit("stream-fresh-batch-9"))
  }

  test("the acquisition sweep invalidates EVERY staged ledger — including higher generations — never other staging protocols") {
    val base = tmp()
    val store = new TableStore(base, "tier_sweep")
    store.write(df("2024-01-01" -> 1), "day", "stream-s-batch-0", append = true)
    val mdir = Paths.get(s"$base/tier_sweep/_manifests")
    store.gcStreamWatermarks(maxAgeMs = Long.MaxValue) // gen 1 — next acquisition claims 2
    // plant: two stale staged ledgers (versioned + legacy), one HIGHER-
    // generation staged ledger (the round-8 ADVICE interleaving: a claimant
    // stalled between generation claim and lock write acquires with a LOWER
    // gen than an already-displaced zombie's staged file — it must be swept
    // anyway, since staging only happens under the lease and no live holder
    // has staged anything at acquisition time), and one staged file per
    // sibling protocol
    val staleV = mdir.resolve(".tmp-ledger-g1-deadbeef")
    val staleLegacy = mdir.resolve(".tmp-ledger-deadbeef")
    val higher = mdir.resolve(".tmp-ledger-g999-cafe")
    val commitTmp = mdir.resolve(".tmp-12345678.json")
    val wmTmp = mdir.resolve(".tmp-wm-12345678")
    for (p <- Seq(staleV, staleLegacy, higher, commitTmp, wmTmp)) Files.writeString(p, "x")
    store.gcStreamWatermarks(maxAgeMs = Long.MaxValue) // gen 2 — sweeps ALL staged ledgers
    assert(!Files.exists(staleV), "gen-1 staged ledger must be invalidated by the gen-2 acquisition")
    assert(!Files.exists(staleLegacy), "legacy unversioned staged ledger reads as gen 0 — invalidated")
    assert(!Files.exists(higher), "a higher-generation zombie's staged ledger must ALSO be invalidated (ADVICE r8)")
    assert(Files.exists(commitTmp), "commit-path staging is a different protocol — never swept here")
    assert(Files.exists(wmTmp), "watermark staging is a different protocol — never swept here")
  }
}
