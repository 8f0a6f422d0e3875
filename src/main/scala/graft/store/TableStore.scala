package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Iceberg-shaped table format, offline realization (no Iceberg runtime in
  * this sandbox — SURVEY env facts): partitioned Parquet data files plus our
  * own manifest/snapshot JSON giving the north_rule's per-partition
  * checkpoint manifests with lineage + row counts + content hashes. The
  * interface is kept at Iceberg granularity (scan / append / overwrite
  * partitions / snapshot ids / time travel / expire) so an Iceberg binding
  * can replace the offline implementation without touching callers.
  *
  * FILE-LEVEL manifests, append-only data files: a commit never deletes or
  * overwrites a data file; each snapshot's manifest lists exactly the files
  * that constitute every partition, and reads resolve through the manifest.
  * That buys snapshot isolation (readers of snapshot k are immune to later
  * commits), time travel (`read(spark, snapshotId)`), logical partition
  * drops as pure metadata commits, and safe compaction; `expireSnapshots`
  * reclaims files no kept snapshot references (Iceberg's expire_snapshots).
  *
  * Commits are ATOMIC with optimistic concurrency (Iceberg's CAS model,
  * realized on a filesystem via `CREATE_NEW`): the snapshot JSON is the
  * commit point; on `FileAlreadyExistsException` the committer re-reads the
  * new parent, re-merges its fresh entries against it, and retries. Data
  * files written by the loser are never orphaned — they are re-manifested
  * under the retried snapshot id.
  *
  * Layout:
  *   <base>/<table>/data/<part>=<v>/s<snapshotId>-<task-file>.parquet
  *   <base>/<table>/_manifests/snapshot-<k>.json
  *
  * Manifest partition keys are the RAW (unescaped) partition values; the
  * on-disk directory names use Hive path escaping (Spark's writer does this
  * for space/colon/etc and renders null as __HIVE_DEFAULT_PARTITION__), so
  * every dir-name ↔ value crossing goes through ExternalCatalogUtils.
  *
  * Content hash per partition = bit_xor(xxhash64(all columns)) — order- and
  * partitioning-insensitive, so "rebuild produced identical content" is
  * checkable without byte-comparing files (parquet task file names contain
  * fresh UUIDs by design).
  */
final case class PartitionManifest(partition: String, rows: Long, contentHash: Long, files: Seq[String])

final case class Snapshot(
    snapshotId: Long,
    parentId: Long, // -1 = none
    inputSnapshot: String, // lineage: identifier of the input this was built from
    partitions: Seq[PartitionManifest],
    // Spark StructType.json of the commit's data as READ BACK, reconciled
    // against the parent's schema (void-typed fields — an all-null-partition
    // delta — take the parent's type, see reconcileSchema). Iceberg stores
    // schemas in metadata for the same reason: it is the ONLY schema source
    // once a full TTL drop + expiry leaves zero data files on disk — without
    // it an empty-table read of such a table has nothing to infer from and
    // throws UNABLE_TO_INFER_SCHEMA (found by the round-7 widened store
    // fuzz, seed 27). None on data-less commits with no parent schema and
    // on pre-schema manifests.
    schemaJson: Option[String] = None
)

/** expected concurrency outcome (partition rewritten/dropped under an
  * optimistic operation) — a DEDICATED type so callers like `jobs.Maintain`
  * can skip exactly these without masking real faults (Spark itself throws
  * IllegalStateException for fatal conditions like a stopped SparkContext).
  */
final class ConcurrentTableModification(msg: String) extends RuntimeException(msg)

/** another maintenance writer holds this table's lease — the caller must
  * NOT proceed (skipping is safe: the holder is doing the same job); a
  * dedicated type so schedulers can distinguish "already running" from a
  * real fault.
  */
final class MaintenanceLockHeld(msg: String) extends RuntimeException(msg)

object TableStore {
  /** stale-lease horizon: a maintenance op is file deletes + one ledger
    * rewrite (seconds at 100 TB metadata scale — no Spark jobs run under the
    * lock), so a lock this old can only belong to a crashed holder.
    */
  val DefaultMaintenanceLockTtlMs: Long = 30L * 60 * 1000

  /** default stream-watermark GC age guard — the SINGLE source of the 7-day
    * default, referenced by `gcStreamWatermarks` and `jobs.Maintain` so the
    * CLI and the store can never drift apart. Generous enough that any
    * stream committing at least weekly never loses its O(1) replay fast
    * path; operators with slower streams widen it per run.
    */
  val DefaultWatermarkMaxAgeMs: Long = 7L * 24 * 3600 * 1000

  /** how old an UNREFERENCED data file must be before expiry treats it as a
    * crashed writer's orphan rather than an in-flight commit's staged file
    * (Iceberg's remove_orphan_files olderThan, default 3 days, is the
    * precedent). A day comfortably exceeds any real stage→hash→commit
    * window while still reclaiming true orphans daily; constructor-tunable
    * for tables whose single commit legitimately runs longer.
    */
  val DefaultOrphanFileGateMs: Long = 24L * 3600 * 1000
}

final class TableStore(
    base: String,
    table: String,
    maintenanceLockTtlMs: Long = TableStore.DefaultMaintenanceLockTtlMs,
    orphanFileGateMs: Long = TableStore.DefaultOrphanFileGateMs
) {

  private def dataDir = s"$base/$table/data"
  private def manifestDir = Paths.get(s"$base/$table/_manifests")

  /** run `f` over a directory listing, always closing the stream (a bare
    * `Files.list` leaks the directory fd until GC — fatal on a long-lived
    * driver doing thousands of commits/compactions).
    */
  private def listDir[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.list(p)
    try f(s.iterator().asScala)
    finally s.close()
  }

  // ---- snapshot bookkeeping -------------------------------------------------

  /** read + parse one manifest, tolerating concurrent writers/expirers:
    * a file deleted between listing and read (expiry — its lineage id is
    * already in the ledger, appended BEFORE the delete) → None; a TRUNCATED
    * body (the linkless-filesystem fallback has a tiny body-visibility
    * window; parse is strict about the closing tokens) → bounded retry,
    * then propagate loudly.
    */
  private def readManifest(p: Path): Option[Snapshot] = {
    var attempts = 0
    while (true) {
      try return Some(ManifestJson.parse(Files.readString(p)))
      catch {
        case _: java.nio.file.NoSuchFileException => return None
        case e: IllegalArgumentException =>
          attempts += 1
          if (attempts >= 20) throw e
          Thread.sleep(10)
      }
    }
    None
  }

  def snapshots: Seq[Snapshot] =
    if (!Files.isDirectory(manifestDir)) Seq.empty
    else
      listDir(manifestDir)(
        _.filter(_.getFileName.toString.startsWith("snapshot-")).toSeq
      ).sortBy(_.getFileName.toString)
        .flatMap(readManifest)
        .sortBy(_.snapshotId)

  /** has a commit with this lineage id already landed? (streaming replay
    * guard — Iceberg's txnAppId/txnVersion idempotence pattern). Consults
    * the lineage LEDGER as well as live manifests: `expireSnapshots` rolls
    * expired manifests' lineage ids into the ledger first, so the guard
    * survives manifest expiry. Full-history scan — callers on a hot path
    * should gate on `streamWatermark` first (O(1)) and only fall back to
    * this after a restart.
    */
  def hasCommit(inputSnapshot: String): Boolean = {
    // order matters vs a concurrent expireSnapshots (which appends to the
    // ledger BEFORE deleting manifests): reading manifests first means a
    // lineage mid-expiry is found either live (manifest not yet deleted) or
    // in the ledger (append already happened) — never missed. A ledger read
    // FAILURE propagates: answering "not committed" on an IO error would
    // green-light a double commit.
    if (snapshots.exists(_.inputSnapshot == inputSnapshot)) return true
    val ledger = manifestDir.resolve("lineage.log")
    Files.exists(ledger) &&
    scala.util.Using(scala.io.Source.fromFile(ledger.toFile))(_.getLines().exists(lineCovers(_, inputSnapshot))).get
  }

  // ---- maintenance lease -----------------------------------------------------
  // expireSnapshots / compactLineageLedger / gcStreamWatermarks each do a
  // read-modify-write over SHARED unversioned state (the lineage ledger, the
  // watermark files) that the snapshot CAS cannot protect: a ledger APPEND
  // (expiry) racing the compaction REWRITE in another process can lose the
  // append — a lost line makes `hasCommit` answer false for an expired
  // streaming batch and green-lights a silent double commit on replay. The
  // single-maintenance-writer contract is therefore LOCK-ENFORCED, not
  // convention: each op runs under an exclusive lease file claimed with the
  // same CREATE_NEW CAS the commit path uses.

  private def maintenanceLockPath = manifestDir.resolve("maintenance.lock")

  /** Run `f` under the table's exclusive maintenance lease.
    *  - live holder (lock mtime younger than the TTL) → MaintenanceLockHeld,
    *    loudly — a second Maintain must skip or fail, never interleave;
    *  - stale lock (crashed holder) → stolen via atomic rename: exactly one
    *    stealer wins the move; the winner VERIFIES the moved file is the
    *    same stale body it observed (a stealer delayed between stat and
    *    move could otherwise displace a FASTER stealer's fresh lease) and
    *    restores it when it is not;
    *  - release deletes the lock only if it still holds OUR body, so a
    *    holder that overran the TTL and was superseded cannot delete the
    *    superseder's lease.
    *
    * CAVEAT (inherent to TTL leases without fencing tokens — same as any
    * lock-file scheme on a bare filesystem): a holder PAUSED longer than
    * the TTL mid-operation can be superseded, and staleness compares this
    * process's clock against the lock file's mtime, so cross-host clock
    * skew eats into the TTL. The TTL (default 30 min, constructor-tunable)
    * is sized orders of magnitude above the seconds these metadata ops
    * take AND above sane NTP skew. On top of that, every leased op
    * re-verifies the lock still carries OUR body via `assertLeaseHeld`
    * IMMEDIATELY before each destructive phase (ledger append/rewrite,
    * manifest/watermark/data deletes) and aborts with MaintenanceLockHeld
    * without writing when displaced — so a zombie resuming from a
    * TTL-overrunning pause can no longer corrupt shared state.
    *
    * The re-verify→mutation microsecond window that remains is then closed
    * per mutation class (round 7):
    *  - the LEDGER REWRITE (the one wrong-METADATA path: a zombie's
    *    REPLACE_EXISTING move could overwrite a superseder's fresh append)
    *    is generation-fenced. Every acquisition claims a monotonically
    *    increasing generation (an atomic write-once `maintenance.gen-<k>`
    *    marker claimed BEFORE the lock file is written, embedded in the
    *    lock body), sweeps staged `.tmp-ledger-g<k>-*`
    *    files of every OLDER generation BEFORE its first mutation, and
    *    stages its own rewrite under its generation. A displaced zombie's
    *    final move therefore fails loudly (its staged source was
    *    invalidated by the successor's sweep) — and in the one interleaving
    *    where the zombie's move lands before the successor's sweep, the
    *    successor has not yet mutated the ledger (the sweep precedes every
    *    mutation), so the landed rewrite is still a faithful compaction of
    *    the exact content the successor sees: no append can be lost in ANY
    *    interleaving, not just outside a millisecond window.
    *  - the DELETE sweeps (expired manifests, watermarks, orphans) need no
    *    fencing: manifest names are monotonic snapshot ids (never reused),
    *    watermark deletes are safe-by-contract (O(1) fast path only), and
    *    orphan deletes are age-gated — a zombie's delete in the window is
    *    the same delete the live holder would perform.
    */
  private def withMaintenanceLock[A](op: String)(f: => A): A = {
    // fail FAST on same-thread nesting: a nested acquisition could never
    // succeed anyway (our own live lock file reads as held), but if it ever
    // did, the inner finally would null the ThreadLocal lease body and the
    // outer op's next assertLeaseHeld would throw IllegalStateException
    // instead of verifying its lease — make the misuse loud at the call
    // site instead of corrupting the outer holder's fencing state
    require(
      currentLeaseBody.get().isEmpty,
      s"nested withMaintenanceLock($op) on a thread already holding the $table maintenance lease — leased ops must call the *Locked bodies directly"
    )
    Files.createDirectories(manifestDir)
    var attempts = 0
    var acquired = false
    var body = ""
    var gen = 0L
    // defense in depth for bodies whose generation has NO marker (a lock
    // written by the earlier round-7 cut that stalled before its separate
    // persist): any generation we ever OBSERVE in a lock body floors our
    // own claim, so even a marker-less zombie cannot be duplicated
    var bodyFloor = 0L
    while (!acquired) {
      // generation claimed PER ATTEMPT, and claimed ATOMICALLY (CREATE_NEW
      // marker) BEFORE the lock file is written: the moment a lock carrying
      // gen k exists, marker k is already durably visible, so any stealer's
      // claim reads ≥ k and returns strictly above it — duplicate
      // generations are structurally impossible (see the fencing scaladoc).
      // A lost lock race strands the attempt's marker until GC — gaps are
      // fine, regressions are not.
      gen = claimGeneration(bodyFloor)
      body = s"pid=${ProcessHandle.current().pid()} op=$op gen=$gen nonce=${java.util.UUID.randomUUID()}"
      try {
        Files.writeString(maintenanceLockPath, body, StandardOpenOption.CREATE_NEW)
        acquired = true
      } catch {
        case _: FileAlreadyExistsException =>
          attempts += 1
          if (attempts > 5) throw new MaintenanceLockHeld(s"maintenance lock on $table: gave up after $attempts acquisition attempts")
          // body BEFORE mtime: lease files are written once and never
          // touched in place, so CONTENT identifies the lease INSTANCE.
          // Reading the body first means any instance that replaces this
          // one later fails the steal identity check below — stat-first
          // ordering could judge a NEW instance's body against an OLD
          // instance's age and steal a fresh lease.
          val observedBody =
            try Some(Files.readString(maintenanceLockPath))
            catch {
              case _: java.nio.file.NoSuchFileException => None // released between probe and read — retry
              case _: java.io.IOException =>
                throw new MaintenanceLockHeld(s"maintenance lock on $table unreadable — treating as held")
            }
          observedBody.foreach(b => bodyFloor = math.max(bodyFloor, lockBodyGen(b)))
          val ageMs =
            if (observedBody.isEmpty) -1L
            else
              try System.currentTimeMillis() - Files.getLastModifiedTime(maintenanceLockPath).toMillis
              catch { case _: java.nio.file.NoSuchFileException => -1L } // released between read and stat — retry
          if (ageMs >= 0 && ageMs < maintenanceLockTtlMs)
            throw new MaintenanceLockHeld(
              s"maintenance lock on $table held by [${observedBody.get}] for ${ageMs}ms (ttl ${maintenanceLockTtlMs}ms) — another maintenance writer is active"
            )
          if (ageMs >= maintenanceLockTtlMs) stealStaleLock(observedBody.get)
      }
    }
    // ORDER IS LOAD-BEARING (the fencing proof in the scaladoc above):
    // our generation was durably claimed BEFORE the lock write (CREATE_NEW
    // marker — every later acquirer reads ≥ gen), and the sweep
    // invalidating ALL staged ledger rewrites (not just older generations:
    // a claimant stalled between claim and lock write can acquire with a
    // LOWER generation than an already-displaced zombie's — round-8 ADVICE)
    // runs BEFORE this holder's first mutation, so "successor mutated"
    // implies "zombie's staged file already swept" in every interleaving;
    // staging only happens under the lease, so nothing the sweep deletes
    // can belong to a live holder.
    // fencing-state IO runs AFTER acquisition but BEFORE the try/finally
    // that releases the lock — a failure here (an unlistable manifest dir)
    // must release the freshly-written lock instead of orphaning it until
    // TTL for every other maintenance writer
    try {
      sweepStaleStagedLedgers()
      gcGenerationMarkers(gen)
    } catch {
      case scala.util.control.NonFatal(e) =>
        releaseLockIfOurs(body)
        throw e
    }
    currentLeaseBody.set(Some(body))
    currentLeaseGen.set(gen)
    try f
    finally {
      currentLeaseBody.set(None)
      currentLeaseGen.set(0L)
      releaseLockIfOurs(body)
    }
  }

  /** content-checked lease release: never remove a superseder's lease. The
    * read→delete gap is microseconds and only reachable after a TTL overrun
    * (see the caveat on withMaintenanceLock). IOException = superseded after
    * a TTL overrun, or already gone — nothing to release either way.
    */
  private def releaseLockIfOurs(body: String): Unit =
    try if (Files.readString(maintenanceLockPath) == body) Files.delete(maintenanceLockPath)
    catch { case _: java.io.IOException => () }

  // the lease body THIS THREAD holds while inside withMaintenanceLock.
  // ThreadLocal, not an instance field: after a TTL overrun a second thread
  // of the SAME instance can steal and re-acquire — an instance-level field
  // would then carry the NEW holder's body, so the paused zombie's
  // assertLeaseHeld would compare the new body against the new lock file,
  // pass, and proceed to write over the live holder's state (defeating the
  // fencing), while the new holder would later read the zombie's None and
  // crash with the wrong exception. Per-thread state keeps each holder
  // comparing its OWN lease body against the file.
  private val currentLeaseBody: ThreadLocal[Option[String]] =
    ThreadLocal.withInitial(() => None)

  // the lease GENERATION this thread holds — ThreadLocal for the same
  // cross-thread-steal reason as the body above. 0 = not in a leased section.
  private val currentLeaseGen: ThreadLocal[Long] = ThreadLocal.withInitial(() => 0L)

  // ---- lease generation fencing ----------------------------------------------
  // Generations are claimed as WRITE-ONCE marker files `maintenance.gen-<k>`
  // via CREATE_NEW: the claim and its persistence are ONE atomic operation.
  // (The first round-7 cut wrote a single mutable `maintenance.generation`
  // file AFTER lock acquisition; a holder stalling between lock-write and
  // that persist could be stolen by a successor that re-read the old value
  // and claimed the SAME number — a duplicate generation un-fences the
  // ledger rewrite. Markers close that structurally: a claim that other
  // claimants cannot see does not exist.) readGeneration = max marker, plus
  // the legacy file's value for manifests written by the earlier cut —
  // read-only migration, never written again. Invariant: a lock body
  // carrying gen k implies marker k exists (claimed BEFORE the lock file is
  // written) or some marker > k exists (GC removes only markers below the
  // claimant's own, never the max) — either way every later claim reads
  // ≥ k and returns > k. Gaps are fine (a lost lock race or a thrown
  // contention error strands its marker until GC); regressions are
  // impossible (markers are never rewritten, only created).
  //
  // Mixed-version caveat (migration window only): a zombie running the
  // EARLIER round-7 cut claims no marker, so its generation is visible only
  // in its lock body (the bodyFloor observation in withMaintenanceLock) —
  // if a legacy stealer removes that lock and then crashes before writing
  // its own, a new-binary claimant never observes the zombie's generation
  // and can duplicate it. Requires two legacy binaries plus two crashes
  // inside one TTL window, and vanishes once all writers run the marker
  // code; the single-version guarantee is unconditional.

  private val genMarkerPrefix = "maintenance.gen-"

  private def markerGen(name: String): Option[Long] =
    if (name.startsWith(genMarkerPrefix)) name.drop(genMarkerPrefix.length).toLongOption else None

  private def readGeneration(): Long = {
    val markers = listDir(manifestDir)(_.flatMap(p => markerGen(p.getFileName.toString)).toSeq)
    val legacy =
      try Files.readString(manifestDir.resolve("maintenance.generation")).trim.toLongOption.getOrElse(0L)
      catch { case _: java.io.IOException => 0L }
    (markers :+ legacy).max
  }

  /** the generation a lock body declares; 0 for legacy (pre-fencing) bodies */
  private def lockBodyGen(body: String): Long =
    body.split(' ').collectFirst { case s if s.startsWith("gen=") => s.drop(4).toLongOption.getOrElse(0L) }.getOrElse(0L)

  /** atomically claim the next free generation above `floor`. A squatter on
    * a marker name (or a concurrent claimant) just bumps the number —
    * claiming never destroys or rewrites anything.
    *
    * The post-create RE-READ closes the number-space-reopen hole: GC frees
    * marker numbers below each holder's generation, so a claimant that
    * stalled between its max read and its CREATE_NEW can wake to find its
    * stale target number FREE again and claim it below a still-live
    * zombie's generation (whose staged ledger rewrite its sweep would then
    * spare). After creating, re-read the max: any higher marker means our
    * claim is not the maximum — abandon it (stranded until GC) and claim
    * again above. A live zombie's own marker outlives its staged files
    * (every acquisition sweeps staged ledgers BEFORE it GCs markers, so
    * "marker k deleted" implies "g<k staging already swept by a holder
    * above k"), so the re-read always sees the zombie's generation while
    * its staging can still land.
    */
  private def claimGeneration(floor: Long): Long = {
    while (true) {
      var g = math.max(readGeneration(), floor) + 1
      var claimed = false
      while (!claimed) {
        try {
          Files.writeString(manifestDir.resolve(s"$genMarkerPrefix$g"), "", StandardOpenOption.CREATE_NEW)
          claimed = true
        } catch { case _: FileAlreadyExistsException => g += 1 }
      }
      if (readGeneration() <= g) return g
      // a higher marker exists — ours is not the max; leave it for GC and go above
    }
    0L // unreachable
  }

  /** GC markers strictly below `gen`. OURS (= the max as of our claim)
    * always survives, so readGeneration never regresses. Per-file
    * best-effort: a straggler marker costs bytes, never correctness.
    */
  private def gcGenerationMarkers(gen: Long): Unit =
    listDir(manifestDir)(_.filter(p => markerGen(p.getFileName.toString).exists(_ < gen)).toSeq).foreach { p =>
      try Files.deleteIfExists(p)
      catch { case _: java.io.IOException => () }
    }

  /** generation of a staged ledger-rewrite file: `.tmp-ledger-g<k>-<uuid>`
    * → k; the legacy unversioned form `.tmp-ledger-<uuid>` (pre-fencing
    * binaries, or a crashed writer) reads as 0, i.e. always stale. UUID hex
    * never starts with 'g', so the two forms cannot collide.
    */
  private[graft] def stagedLedgerGen(name: String): Long =
    if (name.startsWith(".tmp-ledger-g"))
      name.drop(".tmp-ledger-g".length).takeWhile(_.isDigit).toLongOption.getOrElse(0L)
    else 0L

  /** Invalidate EVERY staged ledger rewrite present at acquisition — the
    * displaced holder's final atomic move then fails on its vanished source
    * instead of overwriting this holder's (or a later one's) fresh appends.
    *
    * ALL `.tmp-ledger-*` files, NOT just older generations (round-8 ADVICE
    * fix): staging only ever happens INSIDE a leased section and this sweep
    * runs before the new holder stages anything, so any staged file visible
    * here belongs to a non-holder (crashed or zombified) and is always safe
    * to invalidate. The former `< gen` filter left a hole: a claimant
    * stalled between generation claim and lock write can acquire with gen g
    * AFTER a higher-gen holder (g+1) staged a rewrite, zombified past TTL
    * and was stolen — sweep(g) spared the zombie's `.tmp-ledger-g<g+1>`
    * file, whose REPLACE_EXISTING move could then land over the new
    * holder's fresh ledger state. The generation tag stays in the filename
    * for diagnostics and the move-side NoSuchFile guard is unchanged.
    * ONLY `.tmp-ledger-*` files: commit-path `.tmp-*.json`, watermark
    * `.tmp-wm-*` staging and `maintenance.gen-*` markers are different
    * protocols and are never touched here.
    */
  private def sweepStaleStagedLedgers(): Unit =
    listDir(manifestDir)(_.filter(_.getFileName.toString.startsWith(".tmp-ledger-")).toSeq).foreach { p =>
      try Files.deleteIfExists(p)
      catch { case _: java.io.IOException => () } // vanished or busy — the move-side guard still holds
    }

  /** Test seam: runs at the top of every `assertLeaseHeld`, BEFORE the
    * re-read — a spec installs a hook that steals/replaces the lock file
    * here to deterministically simulate a TTL-overrunning pause (the "GC
    * pause then superseded" zombie) at the exact pre-mutation instant.
    */
  @volatile private[graft] var leaseCheckHook: String => Unit = _ => ()

  /** Re-verify, IMMEDIATELY before a destructive mutation inside a leased
    * section, that the lock file still carries OUR lease body. A holder
    * paused past the TTL and superseded (or whose lock was stolen) aborts
    * here with MaintenanceLockHeld instead of writing over the new
    * holder's state — this is the cheap fencing-token substitute that
    * shrinks the zombie-writer window from "rest of the op" to the
    * microseconds between this read and the one following atomic move.
    */
  private def assertLeaseHeld(what: String): Unit = {
    leaseCheckHook(what)
    val body = currentLeaseBody.get().getOrElse(
      throw new IllegalStateException(s"$what attempted outside a leased section — caller must hold the maintenance lease")
    )
    val stillOurs =
      try Files.readString(maintenanceLockPath) == body
      catch { case _: java.io.IOException => false } // gone or unreadable — fail SAFE, abort
    if (!stillOurs)
      throw new MaintenanceLockHeld(
        s"maintenance lock on $table: lease lost before $what (superseded after a TTL overrun) — aborting without writing"
      )
  }

  /** Steal a stale lock whose content was observed as `observedBody`:
    * ATOMIC rename to a unique grave — one stealer wins the move, losers see
    * NoSuchFile and simply return (the caller's loop re-acquires). The
    * winner verifies the moved file still carries the body it judged stale;
    * on mismatch (a faster stealer's steal + re-acquire landed in between,
    * so this displaced a FRESH lease) — or on a failed verification read
    * (fail SAFE, never fail open) — the file is put back with createLink,
    * the same atomic-EEXIST CAS the commit path uses, so a newer claimant is
    * never clobbered by a replacing rename. If the path was re-claimed
    * inside that window, the grave is LEFT IN PLACE (the displaced copy must
    * not be destroyed here; aged graves are swept by expireSnapshots) and
    * the lock reports held. `private[graft]` so the mismatch/restore
    * semantics are deterministically spec-testable — the production caller
    * is the acquisition loop above.
    */
  private[graft] def stealStaleLock(observedBody: String): Unit =
    try {
      // LAST-INSTANT re-verify, immediately before the rename: the caller's
      // observe→steal delay is unbounded (GC pause, FS stall), and a faster
      // stealer may have stolen + re-acquired in that gap — the instance
      // must STILL carry the observed body and STILL be stale, else the
      // lock reports held without ever being displaced. An UNREADABLE lock
      // fails SAFE to held, same as the acquisition loop (a raw IOException
      // would also escape runAll's skip-loudly handling). The move-then-
      // verify restore below remains as defense-in-depth for a replacement
      // landing inside the re-check→rename microseconds.
      val (reBody, reAge) =
        try (Files.readString(maintenanceLockPath), System.currentTimeMillis() - Files.getLastModifiedTime(maintenanceLockPath).toMillis)
        catch {
          case e: java.nio.file.NoSuchFileException => throw e // lost the race — outer catch returns
          case _: java.io.IOException =>
            throw new MaintenanceLockHeld(s"maintenance lock on $table unreadable at steal re-verify — treating as held")
        }
      if (reBody != observedBody)
        throw new MaintenanceLockHeld(
          s"maintenance lock on $table: the lease changed before the steal — another maintenance writer is active"
        )
      if (reAge < maintenanceLockTtlMs)
        throw new MaintenanceLockHeld(
          s"maintenance lock on $table: the lease is no longer stale — another maintenance writer is active"
        )
      val grave = manifestDir.resolve(s".stale-lock-${java.util.UUID.randomUUID()}")
      Files.move(maintenanceLockPath, grave, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      val moved = try Some(Files.readString(grave)) catch { case _: java.io.IOException => None }
      if (moved.contains(observedBody)) Files.deleteIfExists(grave) // confirmed: the crashed holder's lease
      else {
        try {
          Files.createLink(maintenanceLockPath, grave)
          Files.deleteIfExists(grave)
        } catch {
          case _: FileAlreadyExistsException => () // re-claimed meanwhile — leave the grave
          case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
            // linkless filesystem: non-replacing move (fails if the path was
            // re-claimed; its probe+rename gap is the linkless fallback's
            // documented window)
            try Files.move(grave, maintenanceLockPath)
            catch { case _: java.nio.file.FileSystemException => () } // leave the grave
        }
        throw new MaintenanceLockHeld(
          s"maintenance lock on $table: the lease changed under the steal (restored) — another maintenance writer is active"
        )
      }
    } catch { case _: java.nio.file.NoSuchFileException => () } // lost the steal race — caller loops

  // ---- lineage ledger compaction ---------------------------------------------
  // The ledger grows one line per expired snapshot FOREVER (months of
  // micro-batches → unbounded file + linear hasCommit scans). Streaming
  // lineage ids are `stream-<sid>-batch-<n>` with dense n, so the ledger
  // compacts to per-stream contiguous RANGES — O(#streams + #gaps + #batch
  // jobs) lines regardless of commit count.

  /** marker for a compacted range line: `#range\t<prefix>\t<lo>\t<hi>` covers
    * every id `<prefix><n>` with lo <= n <= hi. Tab-separated — tabs cannot
    * appear in our generated stream prefixes, and a free-form batch lineage
    * id starting with "#range\t" would have to be deliberately adversarial.
    */
  private val rangeMarker = "#range\t"

  /** parse a "#range\t"-marked line: Some((prefix, lo, hi)) for a well-formed
    * compaction-written range; None when the line is not compaction-shaped
    * (a deliberately "#range\t"-prefixed free-form id — unanswerable by
    * equality, documented). A 4-field line whose numbers no longer parse is
    * LEDGER CORRUPTION and THROWS: per the hasCommit invariant, failures must
    * propagate — silently answering "not committed" would green-light a
    * double commit for every id the corrupted range used to cover. Single
    * parser shared by lineCovers and compactLineageLedger so coverage and
    * compaction can never disagree about what a line means.
    */
  private def parseRangeLine(line: String): Option[(String, Long, Long)] =
    line.split('\t') match {
      case Array(_, prefix, lo, hi) =>
        (lo.toLongOption, hi.toLongOption) match {
          case (Some(l), Some(h)) => Some((prefix, l, h))
          case _                  => throw new IllegalStateException(s"corrupted lineage ledger range line: $line")
        }
      case _ => None
    }

  private def lineCovers(line: String, inputSnapshot: String): Boolean =
    if (!line.startsWith(rangeMarker)) line == inputSnapshot
    else
      parseRangeLine(line).exists { case (prefix, l, h) =>
        // CANONICAL digits only (toString round-trip): ranges are built
        // exclusively from canonical ids, so a leading-zero spelling like
        // "batch-007" is a textually different id that must keep answering
        // by exact equality, not numeric coincidence
        inputSnapshot.startsWith(prefix) &&
        inputSnapshot.substring(prefix.length).toLongOption
          .exists(n => n.toString == inputSnapshot.substring(prefix.length) && n >= l && n <= h)
      }

  private val streamLineageId = "^(stream-.+-batch-)(\\d+)$".r

  /** Rewrite the lineage ledger as a bounded summary: contiguous batch-id
    * ranges per stream prefix, plus deduped free-form ids, via tmp + atomic
    * move (concurrent `hasCommit` readers see the old or the new file, both
    * complete). Coverage is EXACTLY preserved — every id the old ledger
    * answered true for, the new one does too, and nothing new. Single
    * Single maintenance writer ENFORCED by the lease: a ledger APPEND racing
    * the rewrite would be lost, so acquisition failure throws
    * MaintenanceLockHeld rather than interleaving.
    */
  def compactLineageLedger(): Unit = {
    if (!Files.isDirectory(manifestDir)) return
    withMaintenanceLock("compactLineageLedger")(compactLineageLedgerLocked())
  }

  /** lock-free body — callers MUST hold the maintenance lease */
  private def compactLineageLedgerLocked(): Unit = {
    val ledger = manifestDir.resolve("lineage.log")
    if (!Files.exists(ledger)) return
    val lines = scala.util.Using(scala.io.Source.fromFile(ledger.toFile))(_.getLines().toVector).get
    // prefix → merged, sorted disjoint [lo, hi] intervals
    val intervals = scala.collection.mutable.LinkedHashMap.empty[String, List[(Long, Long)]]
    val freeForm = scala.collection.mutable.LinkedHashSet.empty[String]
    def add(prefix: String, lo: Long, hi: Long): Unit =
      intervals(prefix) = intervals.getOrElse(prefix, Nil) :+ ((lo, hi))
    // Only CANONICAL ids fold into ranges. Lineage ids are CALLER-SUPPLIED
    // (any string can be an inputSnapshot), so the digit suffix can overflow
    // Long or carry leading zeros ("batch-007"); folding either would CHANGE
    // coverage — over-Long by crashing maintenance forever, leading zeros by
    // making the numerically-equal-but-textually-different id "batch-7" read
    // as committed ("nothing new" guarantee). Both stay freeForm (exact
    // equality). parseRangeLine throws on corrupted range lines — same loud
    // contract as lineCovers.
    for (line <- lines if line.nonEmpty)
      if (line.startsWith(rangeMarker))
        parseRangeLine(line) match {
          case Some((prefix, l, h)) => add(prefix, l, h)
          case None                 => freeForm += line // "#range\t"-prefixed free-form id: keep verbatim
        }
      else
        line match {
          case streamLineageId(prefix, n) if n.toLongOption.exists(_.toString == n) => add(prefix, n.toLong, n.toLong)
          case other                                                                => freeForm += other
        }
    val out = new StringBuilder
    for (id <- freeForm) out.append(id).append('\n')
    for ((prefix, ivs) <- intervals) {
      val merged = ivs.sortBy(_._1).foldLeft(List.empty[(Long, Long)]) {
        case ((plo, phi) :: rest, (lo, hi)) if lo <= phi + 1 => (plo, math.max(phi, hi)) :: rest
        case (acc, iv)                                       => iv :: acc
      }
      for ((lo, hi) <- merged.reverse) out.append(s"$rangeMarker$prefix\t$lo\t$hi\n")
    }
    // staged under THIS lease's generation: a successor's acquisition sweep
    // invalidates it, so a zombie displaced after the assertLeaseHeld below
    // cannot land a stale rewrite over the successor's fresh appends (the
    // full interleaving argument is on withMaintenanceLock)
    val tmp = manifestDir.resolve(s".tmp-ledger-g${currentLeaseGen.get()}-${java.util.UUID.randomUUID}")
    Files.writeString(tmp, out.toString)
    // a displaced holder must abort BEFORE the rewrite lands: replacing the
    // ledger with a stale compaction could lose a superseder's fresh append
    try assertLeaseHeld("lineage-ledger rewrite")
    catch { case e: Throwable => Files.deleteIfExists(tmp); throw e }
    ledgerMoveHook() // test seam: the re-verify→move window
    try Files.move(tmp, ledger, java.nio.file.StandardCopyOption.REPLACE_EXISTING, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.NoSuchFileException =>
        throw new MaintenanceLockHeld(
          s"maintenance lock on $table: staged ledger rewrite (generation ${currentLeaseGen.get()}) was invalidated by a newer lease generation — aborting without writing"
        )
    }
  }

  /** Test seam: runs between the rewrite's final pre-mutation re-verify and
    * its atomic move — a spec simulates a superseding holder INSIDE that
    * window (the last theoretical wrong-metadata path, closed by generation
    * fencing) to prove the displaced move is rejected.
    */
  @volatile private[graft] var ledgerMoveHook: () => Unit = () => ()

  /** Delete per-stream watermark files whose stream appears in NO kept
    * manifest (it has not committed within the snapshot-retention horizon)
    * and whose file is older than `maxAgeMs` (a just-born stream's watermark
    * may precede its first commit's visibility; an ACTIVE stream refreshes
    * its watermark's mtime on every commit). The ledger is deliberately NOT
    * consulted: its coverage is permanent by design, so ledger-based liveness
    * would pin the watermark of every generation that ever committed forever
    * — repeated checkpoint resets (the case this GC exists for) would each
    * leak one watermark file. Deleting any watermark is CORRECT regardless:
    * it is only the O(1) fast path — a live stream whose watermark vanishes
    * pays one hasCommit probe (manifests + ledger, authoritative) on its next
    * replayed batch and then rewrites the watermark. The kept-manifest signal
    * is BEST-EFFORT (maintenance TTL/compaction commits can occupy all kept
    * snapshots with non-stream lineage), so the age guard is the real
    * protection for infrequent streams — hence a default generous enough
    * that any stream committing at least weekly never loses its fast path.
    * Returns files deleted.
    */
  def gcStreamWatermarks(maxAgeMs: Long = TableStore.DefaultWatermarkMaxAgeMs): Int = {
    if (!Files.isDirectory(manifestDir)) return 0
    withMaintenanceLock("gcStreamWatermarks")(gcStreamWatermarksLocked(maxAgeMs))
  }

  private def gcStreamWatermarksLocked(maxAgeMs: Long): Int = {
    val liveStreamIds = snapshots.map(_.inputSnapshot).collect {
      case streamLineageId(prefix, _) => prefix.stripPrefix("stream-").stripSuffix("-batch-")
    }
    val expected = liveStreamIds.map(watermarkPath(_).getFileName.toString).toSet
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val candidates = listDir(manifestDir)(_.filter(_.getFileName.toString.startsWith("watermark-")).toSeq)
    // watermark deletes are safe-by-contract (fast path only), but a zombie
    // should still stand down the moment it is superseded
    assertLeaseHeld("stream-watermark delete sweep")
    var deleted = 0
    for (p <- candidates)
      if (!expected(p.getFileName.toString) && Files.getLastModifiedTime(p).toMillis < cutoff) {
        if (Files.deleteIfExists(p)) deleted += 1
      }
    deleted
  }

  // ---- per-stream commit watermarks -----------------------------------------
  // A streaming writer records the highest batch id it has durably committed;
  // the fast replay guard is a single O(1) file read instead of a manifest
  // scan. Single writer per stream id; the update is an atomic rename.

  private def watermarkPath(streamId: String) =
    manifestDir.resolve(s"watermark-${java.lang.Long.toHexString(scala.util.hashing.MurmurHash3.stringHash(streamId).toLong & 0xffffffffL)}-${streamId.replaceAll("[^A-Za-z0-9_-]", "_").take(40)}")

  def streamWatermark(streamId: String): Option[Long] = {
    // single read, no exists() pre-check: gcStreamWatermarks may delete the
    // file between the two calls (its contract says deleting any watermark
    // is safe BECAUSE this is only a fast path), so a vanished file must
    // read as "no watermark", never crash the streaming batch
    try Files.readString(watermarkPath(streamId)).trim.toLongOption
    catch { case _: java.nio.file.NoSuchFileException => None }
  }

  def setStreamWatermark(streamId: String, batchId: Long): Unit = {
    Files.createDirectories(manifestDir)
    val tmp = manifestDir.resolve(s".tmp-wm-${java.util.UUID.randomUUID}")
    Files.writeString(tmp, batchId.toString)
    Files.move(tmp, watermarkPath(streamId), java.nio.file.StandardCopyOption.REPLACE_EXISTING, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Parses ONLY the lexically-last manifest (names are zero-padded, so
    * lexical == numeric order) — a per-micro-batch streaming committer calls
    * this on every commit, and parsing the full history each time would make
    * cumulative commit cost quadratic in commit count.
    */
  def currentSnapshot: Option[Snapshot] = {
    var attempts = 0
    while (attempts < 20) {
      if (!Files.isDirectory(manifestDir)) return None
      val newest = listDir(manifestDir)(
        _.filter(_.getFileName.toString.startsWith("snapshot-")).maxByOption(_.getFileName.toString)
      )
      newest match {
        case None => return None
        case Some(p) =>
          readManifest(p) match {
            case Some(s) => return Some(s)
            case None    => attempts += 1 // deleted between list and read (expiry) — re-list
          }
      }
    }
    sys.error(s"currentSnapshot: manifest churn did not settle on $table")
  }

  def snapshot(id: Long): Option[Snapshot] = snapshots.find(_.snapshotId == id)

  /** partitions already built from this input (resume = skip these) */
  def completedPartitions(inputSnapshot: String): Set[String] =
    currentSnapshot
      .filter(_.inputSnapshot == inputSnapshot)
      .map(_.partitions.map(_.partition).toSet)
      .getOrElse(Set.empty)

  // ---- IO --------------------------------------------------------------------

  /** manifest entry → concrete scan paths. File-tracked entries resolve to
    * their exact file set; legacy (pre-file-tracking) entries resolve to the
    * NON-snapshot-prefixed files of their single partition directory — never
    * the whole dir (later snapshot-prefixed rewrites land in the same dir
    * under the append-only layout, and including them would both
    * double-count current reads and leak future data into time travel) and
    * never the whole dataDir.
    */
  private def entryPaths(p: PartitionManifest): Seq[String] =
    if (p.files.nonEmpty) p.files.map(f => s"$dataDir/$f")
    else legacyPartitionFiles(p.partition)

  private val snapshotFileName = "^s\\d{9}-".r

  /** legacy manifest entry → its original data files: the files of the dir
    * whose escaped `<col>=<v>` suffix unescapes to the raw partition value,
    * EXCLUDING snapshot-prefixed files (those belong to later commits).
    */
  private def legacyPartitionFiles(partition: String): Seq[String] = {
    val dd = Paths.get(dataDir)
    if (!Files.isDirectory(dd)) return Seq.empty
    val dir = listDir(dd)(
      _.filter(Files.isDirectory(_))
        .find { d =>
          val name = d.getFileName.toString
          val eq = name.indexOf('=')
          eq >= 0 && ExternalCatalogUtils.unescapePathName(name.substring(eq + 1)) == partition
        }
    )
    dir.toSeq.flatMap { d =>
      listDir(d)(
        _.filter { f =>
          val n = f.getFileName.toString
          n.endsWith(".parquet") && snapshotFileName.findFirstIn(n).isEmpty
        }.map(_.toString).toSeq
      ).sorted
    }
  }

  /** manifest-resolved scan of the current snapshot (snapshot isolation: a
    * concurrent commit cannot change the file set this read sees). An EMPTY
    * current manifest (e.g. full TTL drop) is an empty table, not a raw
    * scan; the raw `dataDir` fallback applies ONLY when no manifest exists
    * at all (pre-manifest data laid down outside this store).
    */
  def read(spark: SparkSession): DataFrame =
    currentSnapshot match {
      case Some(s) if s.partitions.nonEmpty => readSnapshot(spark, s)
      case Some(s)                          => emptyTable(spark, prefer = Some(s))
      case None                             => spark.read.parquet(dataDir)
    }

  /** empty DataFrame with the table's schema. Source preference: the
    * requested snapshot's manifest schema, then the newest retained
    * manifest's, then any file a past snapshot still references, then the
    * raw dir. The manifest schema is load-bearing, not a shortcut: after a
    * full TTL drop + snapshot expiry ZERO data files can remain on disk —
    * the file-based recoveries then have nothing to infer from (the raw-dir
    * scan used to throw UNABLE_TO_INFER_SCHEMA; widened store fuzz, seed 27).
    */
  private def emptyTable(spark: SparkSession, prefer: Option[Snapshot] = None): DataFrame = {
    val manifestSchema = prefer.flatMap(_.schemaJson).orElse {
      val it = snapshots.reverseIterator.flatMap(_.schemaJson)
      if (it.hasNext) Some(it.next()) else None
    }
    manifestSchema match {
      case Some(sj) =>
        val st = org.apache.spark.sql.types.DataType.fromJson(sj).asInstanceOf[org.apache.spark.sql.types.StructType]
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
      case None => // pre-schema lineage: recover from files while any remain
        val anyPaths = snapshots.reverseIterator
          .map(s => s.partitions.flatMap(entryPaths))
          .find(_.nonEmpty)
        anyPaths match {
          case Some(paths) => spark.read.option("basePath", dataDir).parquet(paths: _*).limit(0)
          case None if Files.isDirectory(Paths.get(dataDir)) =>
            // a data dir holding no readable parquet (everything expired)
            // cannot yield a schema — an empty schemaless frame is the
            // honest answer, not an inference crash
            try spark.read.parquet(dataDir).limit(0)
            catch { case _: org.apache.spark.sql.AnalysisException => spark.emptyDataFrame }
          case None => spark.emptyDataFrame
        }
    }
  }

  /** time travel: scan the table exactly as of `snapshotId` */
  def read(spark: SparkSession, snapshotId: Long): DataFrame = {
    val s = snapshot(snapshotId).getOrElse(sys.error(s"no snapshot $snapshotId"))
    if (s.partitions.isEmpty) emptyTable(spark, prefer = Some(s)) else readSnapshot(spark, s)
  }

  private def readSnapshot(spark: SparkSession, s: Snapshot): DataFrame = {
    val paths = s.partitions.flatMap(entryPaths)
    require(paths.nonEmpty, s"snapshot ${s.snapshotId}: no resolvable data paths")
    spark.read.option("basePath", dataDir).parquet(paths: _*)
  }

  /** Write df partitioned by `partitionCol` as NEW data files (staged, then
    * moved in with a snapshot-id prefix — existing files are never touched),
    * then commit a snapshot whose manifest lists, per partition, the exact
    * file set plus row count + content hash + input lineage. A rewritten
    * partition's entry references only the new files; untouched partitions
    * inherit the parent's entries verbatim — commit cost is O(delta), which
    * is what Iceberg manifests are for. `onlyPartitions`, when set,
    * restricts the write (resume path: everything else is already on disk).
    *
    * `append = true` (Iceberg AppendFiles): a written partition's entry
    * MERGES with the parent's — files concatenated, rows summed, content
    * hashes XOR-combined (bit_xor over row hashes composes under union,
    * which is exactly why that hash was chosen). This is the streaming
    * micro-batch path: each foreachBatch commit adds files, never rewrites;
    * `compactPartition` bounds the resulting file counts.
    */
  def write(
      df: DataFrame,
      partitionCol: String,
      inputSnapshot: String,
      onlyPartitions: Option[Set[String]] = None,
      append: Boolean = false
  ): Snapshot = {
    val spark = df.sparkSession
    val toWrite = onlyPartitions match {
      case Some(ps) if ps.nonEmpty =>
        // manifests key the null partition as __HIVE_DEFAULT_PARTITION__ —
        // that member must select IS NULL rows explicitly: isin(null, ...)
        // evaluates to NULL for null values and WHERE drops them, which on
        // the resume path would silently never write the null partition
        val c = col(partitionCol).cast("string")
        val real = (ps - ExternalCatalogUtils.DEFAULT_PARTITION_NAME).toSeq
        val conds =
          (if (real.nonEmpty) Seq(c.isin(real: _*)) else Seq.empty) ++
            (if (ps.contains(ExternalCatalogUtils.DEFAULT_PARTITION_NAME)) Seq(c.isNull) else Seq.empty)
        df.where(conds.reduce(_ || _))
      case Some(_) => df.where(lit(false))
      case None    => df
    }
    // the prospective snapshot id seeds the file-name prefix only (cosmetic
    // lineage hint); the commit id is decided atomically at commit time
    val provisionalId = currentSnapshot.map(_.snapshotId).getOrElse(-1L) + 1

    // stage the write, then move task files into the partition dirs under a
    // unique snapshot prefix (append-only: old snapshots keep their files).
    // Stage dir carries a UUID so concurrent writers can never share one.
    val stage = Paths.get(s"$base/$table/.stage-$provisionalId-${java.util.UUID.randomUUID}")
    val moved: Map[String, Seq[String]] =
      try {
        toWrite.write.mode("overwrite").partitionBy(partitionCol).parquet(stage.toString)
        moveStaged(stage, partitionCol, provisionalId)
      } finally deleteRecursively(stage) // a failed/killed staging write must not leak its copy

    val (fresh, freshSchema) = hashFiles(spark, partitionCol, moved)
    val writtenParts = moved.keySet
    commit(
      inputSnapshot,
      schema = freshSchema,
      merge = parent => {
        val parentByPart = parent.map(_.partitions.map(p => p.partition -> p).toMap).getOrElse(Map.empty)
        val freshMerged =
          if (!append) fresh
          else
            fresh.map { f =>
              parentByPart.get(f.partition) match {
                case Some(pe) =>
                  require(pe.files.nonEmpty, s"cannot append to legacy file-less entry ${f.partition}")
                  PartitionManifest(f.partition, pe.rows + f.rows, pe.contentHash ^ f.contentHash, pe.files ++ f.files)
                case None => f
              }
            }
        val inherited = parent
          .map(_.partitions.filterNot(p => writtenParts(p.partition)))
          .getOrElse(Seq.empty)
        (inherited ++ freshMerged).sortBy(_.partition)
      }
    )
  }

  /** stage/<part>=<esc> /<file> → data/<part>=<esc>/s<id>-<file>; returns
    * RAW partition value → relative file paths ("<part>=<esc>/s<id>-<file>").
    */
  private def moveStaged(stage: Path, partitionCol: String, newId: Long): Map[String, Seq[String]] = {
    if (!Files.isDirectory(stage)) return Map.empty
    listDir(stage)(
      _.filter(d => Files.isDirectory(d) && d.getFileName.toString.startsWith(s"$partitionCol="))
        .map { partDir =>
          val dirName = partDir.getFileName.toString
          // dir names are Hive-escaped; manifests key by the raw value
          val partValue = ExternalCatalogUtils.unescapePathName(dirName.stripPrefix(s"$partitionCol="))
          val target = Paths.get(s"$dataDir/$dirName")
          Files.createDirectories(target)
          val rels = listDir(partDir)(
            _.filter(_.getFileName.toString.endsWith(".parquet"))
              .map { f =>
                val newName = f"s$newId%09d-${f.getFileName.toString}"
                // a concurrent expiry can delete the target dir in the gap
                // between our createDirectories and this move (it looked
                // empty from over there) — recreate and retry once
                try Files.move(f, target.resolve(newName))
                catch {
                  case _: java.nio.file.NoSuchFileException =>
                    Files.createDirectories(target)
                    Files.move(f, target.resolve(newName))
                }
                s"$dirName/$newName"
              }
              .toSeq
          ).sorted
          partValue -> rels
        }
        .toMap
    )
  }

  /** per-partition (rows, content hash, files) over exactly the given files,
    * plus the READ-BACK schema of those files (StructType.json) — captured
    * here because this frame already has the basePath-inferred shape every
    * later read of the table will see
    */
  private def hashFiles(
      spark: SparkSession,
      partitionCol: String,
      files: Map[String, Seq[String]]
  ): (Seq[PartitionManifest], Option[String]) = {
    if (files.isEmpty || files.values.forall(_.isEmpty)) return (Seq.empty, None)
    val paths = files.values.flatten.toSeq.sorted.map(f => s"$dataDir/$f")
    val onDisk = spark.read.option("basePath", dataDir).parquet(paths: _*)
    val hashCols = onDisk.columns.sorted.map(col).toSeq
    // null partition values land in __HIVE_DEFAULT_PARTITION__ on disk;
    // key the manifest the same way so lookup and dir names agree
    val pKey = coalesce(col(partitionCol).cast("string"), lit(ExternalCatalogUtils.DEFAULT_PARTITION_NAME))
    onDisk
      .groupBy(pKey.as("p"))
      .agg(count(lit(1)).as("rows"), bit_xor(xxhash64(hashCols: _*)).as("h"))
      .collect()
      .map(r => PartitionManifest(r.getAs[String]("p"), r.getAs[Long]("rows"), r.getAs[Long]("h"), files(r.getAs[String]("p"))))
      .sortBy(_.partition)
      .toSeq -> Some(onDisk.schema.json)
  }

  /** The schema a commit RECORDS, reconciled against the parent's. The
    * fresh schema comes from the commit's DELTA files only (hashFiles), and
    * a delta whose partition-dir values are all the null placeholder infers
    * the partition column as VOID (NullType) — the same inference quirk the
    * compaction path re-types before writing. Recording void verbatim would
    * poison the manifest schema: an empty-table read materialized from it
    * could never union with typed batches or be re-written partitionBy. Per
    * field: a void-typed field takes the parent's NON-void type for that
    * field when the parent has one, else string (null is representable in
    * any of these; string mirrors the compaction re-type). Non-void fresh
    * fields win — the newest data's read-back shape is the table's shape.
    *
    * The invariant "a recorded schema never contains NullType" is enforced
    * on EVERY output path, including the fresh=None parent-propagation case
    * and the parent-field lookup: a manifest poisoned by a pre-reconcile
    * build is healed at the next commit instead of propagated forever. When
    * the parent CARRIES the field but as void (the poisoned-manifest case)
    * the heal consults the retained LINEAGE, newest first — older manifests
    * still carry the field's true type, and a metadata-only commit then
    * recovers it instead of blanket-falling to string (found by the round-7
    * fuzz's poison op: a TTL no-op over a poisoned parent mistyped a long
    * column as string). Lazy: the lineage is re-read from disk ONLY when a
    * void field survives the parent lookup — never on the commit hot path.
    * Stale types cannot be resurrected: a legitimately re-typed field is
    * non-void in the immediate parent so the walk never runs, and a field
    * ABSENT from the parent (a dropped column re-added as all-null) takes
    * the string fallback directly — walking history there would resurrect
    * the dropped column's old type over data that no longer is one.
    *
    * Known imprecision (migration-only): a PRE-schema lineage (schemaJson
    * absent everywhere) gives a void field the blanket string fallback even
    * when still-live typed data files could infer the true type. Reading
    * parquet footers at commit time to recover it would put a table scan on
    * every commit's hot path — not worth it for a case that only exists
    * while migrating manifests written before the schema feature; the
    * mistyped field fails loudly (union / partitionBy AnalysisException),
    * never silently corrupts.
    */
  private def reconcileSchema(
      fresh: Option[String],
      parentSchema: Option[String],
      lineageSchemas: => Iterator[String] // newest-first retained manifest schemas
  ): Option[String] = {
    import org.apache.spark.sql.types.{DataType, NullType, StringType, StructType}
    def parse(j: String) = DataType.fromJson(j).asInstanceOf[StructType]
    lazy val ps = parentSchema.map(parse) // parsed ONLY when a void field exists
    // LazyList: memoized AND per-element lazy — `find` parses retained
    // manifests only up to the first hit, and only on a failed parent lookup
    lazy val ancestors = lineageSchemas.map(parse).to(LazyList)
    def nonVoid(st: StructType, name: String): Option[org.apache.spark.sql.types.DataType] =
      st.fields.find(pf => pf.name == name && pf.dataType != NullType).map(_.dataType)
    def resolve(name: String): org.apache.spark.sql.types.DataType =
      ps.flatMap(_.fields.find(_.name == name)) match {
        case Some(pf) if pf.dataType != NullType => pf.dataType
        case Some(_) => // present-but-void parent = the poisoned case: walk the lineage
          ancestors.iterator.flatMap(nonVoid(_, name)).nextOption().getOrElse(StringType)
        case None => StringType // absent from the parent: never resurrect a dropped column's type
      }
    fresh.orElse(parentSchema).map { j =>
      val st = parse(j)
      if (!st.fields.exists(_.dataType == NullType)) j
      else StructType(st.fields.map(f => if (f.dataType != NullType) f else f.copy(dataType = resolve(f.name)))).json
    }
  }

  /** Atomic commit point (Iceberg CAS, filesystem realization): compute the
    * manifest against the CURRENT parent via `merge`, then claim the next
    * snapshot file with CREATE_NEW. If another committer claimed it first,
    * re-read the new parent, re-merge, retry — both committers' data files
    * survive in the final lineage.
    */
  private def commit(
      inputSnapshot: String,
      merge: Option[Snapshot] => Seq[PartitionManifest],
      // read-back schema of the data this commit introduces; None (metadata-
      // only commits: TTL drops, empty writes) propagates the parent's
      schema: Option[String] = None
  ): Snapshot = {
    // Lineage ids are caller-supplied free-form strings, but expiry rolls
    // them VERBATIM into the line-oriented lineage ledger: an embedded
    // newline splits into lines that never answer hasCommit (silent double
    // commit later), and a tab lets a crafted id collide with the
    // '#range\t' compaction namespace (wedging the table, or silently
    // broadening coverage). Reject at the commit boundary — the only place
    // ids enter the system — so the ledger's grammar is closed by
    // construction.
    require(
      !inputSnapshot.exists(c => c == '\t' || c == '\n' || c == '\r'),
      s"inputSnapshot must not contain tab/newline characters (ledger line grammar): ${inputSnapshot.replaceAll("[\\t\\n\\r]", "?")}"
    )
    Files.createDirectories(manifestDir)
    var attempts = 0
    while (attempts < 1000) {
      // contention backoff: without it every CAS loser immediately re-reads
      // the parent, re-merges and re-links — a thundering herd that turns
      // N concurrent committers into O(N²) filesystem round-trips. First
      // few retries are free (the common 2-writer race resolves instantly);
      // past that, exponential + full jitter, capped well under the commit
      // latency itself.
      if (attempts > 3) {
        val cap = math.min(200L, 1L << math.min(attempts - 3, 8))
        Thread.sleep(java.util.concurrent.ThreadLocalRandom.current().nextLong(cap + 1))
      }
      val parentSnap = currentSnapshot
      val parent = parentSnap.map(_.snapshotId).getOrElse(-1L)
      val snap = Snapshot(
        parent + 1,
        parent,
        inputSnapshot,
        merge(parentSnap),
        reconcileSchema(schema, parentSnap.flatMap(_.schemaJson), snapshots.reverseIterator.flatMap(_.schemaJson))
      )
      // The claim must be atomic in CONTENT, not just in name: a bare
      // CREATE_NEW + write publishes an empty/partial file that concurrent
      // readers could parse (or, after a crash mid-write, wedges the table
      // forever). Write the full JSON to a temp file first, then CLAIM the
      // snapshot name with createLink — POSIX link(2) fails atomically with
      // EEXIST, and the linked content is complete by construction.
      val target = manifestDir.resolve(f"snapshot-${snap.snapshotId}%09d.json")
      val rendered = ManifestJson.render(snap)
      val tmp = manifestDir.resolve(s".tmp-${java.util.UUID.randomUUID}.json")
      Files.writeString(tmp, rendered, StandardOpenOption.CREATE_NEW)
      try {
        Files.createLink(target, tmp)
        return snap
      } catch {
        case _: FileAlreadyExistsException => attempts += 1 // lost the race; re-merge on new parent
        case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          // Ambiguous link failure. Three real cases, disambiguated by
          // looking at the target (the Unix provider reports a no-hardlink
          // mount as FileSystemException/EPERM, never UnsupportedOperation,
          // and an NFS timeout can fail client-side AFTER the link landed):
          //   1. target holds OUR content → the link actually landed: done.
          //   2. target holds other content → we lost a race: retry/re-merge.
          //   3. no target → links unsupported here: single-shot CREATE_NEW
          //      content write (still a CAS on the name, tiny body-visibility
          //      window documented).
          if (Files.exists(target)) {
            if (Files.readString(target) == rendered) return snap
            attempts += 1
          } else {
            try {
              Files.writeString(target, rendered, StandardOpenOption.CREATE_NEW)
              return snap
            } catch { case _: FileAlreadyExistsException => attempts += 1 }
          }
      } finally Files.deleteIfExists(tmp)
    }
    sys.error(s"commit contention: gave up after $attempts attempts on $table")
  }

  /** Small-file compaction: rewrite one partition's CURRENT file set into
    * `targetFiles` (streaming/foreachBatch appends accumulate one file per
    * micro-batch per task — at 100 TB that's a scan-planning and listing
    * tax). Content-identical by construction; the new snapshot's entry for
    * the partition references only the compacted files, everything else is
    * inherited, and the replaced files stay on disk for older snapshots
    * until `expireSnapshots`. If a concurrent commit rewrites the same
    * partition between read and commit, the compaction ABORTS (its result
    * no longer represents current content) — Iceberg's validation failure.
    */
  def compactPartition(spark: SparkSession, partitionCol: String, partition: String, targetFiles: Int = 1): Snapshot = {
    val parentSnap = currentSnapshot.getOrElse(throw new ConcurrentTableModification("nothing to compact: no snapshot"))
    val entry = parentSnap.partitions
      .find(_.partition == partition)
      .getOrElse(throw new ConcurrentTableModification(s"no partition $partition in snapshot ${parentSnap.snapshotId}"))
    val provisionalId = parentSnap.snapshotId + 1

    val stage = Paths.get(s"$base/$table/.stage-$provisionalId-${java.util.UUID.randomUUID}")
    val moved =
      try {
        val read0 = spark.read
          .option("basePath", dataDir)
          .parquet(entryPaths(entry): _*)
        // compacting the NULL partition alone: every value in the read is
        // null, so partition-type inference yields VOID, which partitionBy
        // refuses to write (INVALID_PARTITION_COLUMN_DATA_TYPE) — re-type to
        // string; the dir name (__HIVE_DEFAULT_PARTITION__) and the content
        // hash (null hashes to the seed under any type) are type-independent
        val readDf =
          if (read0.schema(partitionCol).dataType == org.apache.spark.sql.types.NullType)
            read0.withColumn(partitionCol, col(partitionCol).cast("string"))
          else read0
        readDf
          .coalesce(targetFiles)
          .write
          .partitionBy(partitionCol)
          .parquet(stage.toString)
        moveStaged(stage, partitionCol, provisionalId)
      } finally deleteRecursively(stage)

    val (fresh, freshSchema) = hashFiles(spark, partitionCol, moved)
    commit(
      parentSnap.inputSnapshot,
      schema = freshSchema,
      merge = parent => {
        val nowEntry = parent.flatMap(_.partitions.find(_.partition == partition))
        if (!nowEntry.exists(_.files == entry.files))
          throw new ConcurrentTableModification(s"compaction of $table/$partition aborted: partition changed concurrently")
        (parent.map(_.partitions.filterNot(_.partition == partition)).getOrElse(Seq.empty) ++ fresh)
          .sortBy(_.partition)
      }
    )
  }

  /** data-file count of one partition in the CURRENT snapshot */
  def partitionFileCount(partitionCol: String, partition: String): Int =
    currentSnapshot.flatMap(_.partitions.find(_.partition == partition)).map(_.files.size).getOrElse {
      val d = Paths.get(s"$dataDir/$partitionCol=${ExternalCatalogUtils.escapePathName(partition)}")
      if (!Files.isDirectory(d)) 0
      else listDir(d)(_.count(_.getFileName.toString.endsWith(".parquet")))
    }

  /** TTL demotion: drop partitions older than `cutoff` (the coarser tier
    * covering them must have been built first — caller's contract). A pure
    * METADATA commit: the new manifest simply omits the dropped partitions;
    * their files remain readable through older snapshots until expired.
    */
  def dropPartitionsOlderThan(spark: SparkSession, partitionCol: String, cutoff: String, inputSnapshot: String): Snapshot =
    commit(inputSnapshot, parent => parent.map(_.partitions.filter(_.partition >= cutoff)).getOrElse(Seq.empty))

  /** Physical cleanup (Iceberg expire_snapshots): keep the last `keepLast`
    * snapshots, delete every data file referenced by no kept snapshot and
    * the expired manifest JSONs. Runs under the maintenance lease (the
    * ledger append below must never race another maintainer's ledger
    * rewrite). `minSnapshotAgeMs` (Iceberg's olderThan) additionally keeps
    * every snapshot YOUNGER than that age regardless of count — the reader
    * grace window: keepLast alone is count-based, so a fast streaming
    * writer can erode a long-running reader's resolved snapshot to seconds
    * before its files are deleted under the scan. Size it above the longest
    * read job against a live tier (0 = count-only, the default). Returns
    * the number of data files deleted.
    */
  def expireSnapshots(keepLast: Int = 1, minSnapshotAgeMs: Long = 0L): Int = {
    if (!Files.isDirectory(manifestDir)) return 0
    withMaintenanceLock("expireSnapshots")(expireSnapshotsLocked(keepLast, minSnapshotAgeMs))
  }

  private def expireSnapshotsLocked(keepLast: Int, minSnapshotAgeMs: Long): Int = {
    val all = snapshots
    if (all.isEmpty) return 0
    val ageCutoff = System.currentTimeMillis() - minSnapshotAgeMs
    val expiring = all.dropRight(math.max(1, keepLast)).filter { s =>
      minSnapshotAgeMs <= 0L || {
        try Files.getLastModifiedTime(manifestDir.resolve(f"snapshot-${s.snapshotId}%09d.json")).toMillis < ageCutoff
        catch { case _: java.nio.file.NoSuchFileException => true } // manifest already gone — finish its cleanup
      }
    }
    val expiringIds = expiring.map(_.snapshotId).toSet
    val kept = all.filterNot(s => expiringIds(s.snapshotId))
    val referenced = kept.flatMap(s => s.partitions.flatMap(_.files)).toSet
    // BEFORE deleting, roll the expiring manifests' lineage ids into the
    // ledger so hasCommit (streaming replay guard) survives expiry; a crash
    // between append and delete leaves both — harmless duplicates
    if (expiring.nonEmpty) {
      // a zombie's append racing a superseder's compaction rewrite is the
      // exact lost-line hazard the lease exists for — re-verify first
      assertLeaseHeld("lineage-ledger append (expiry)")
      Files.writeString(
        manifestDir.resolve("lineage.log"),
        expiring.map(_.inputSnapshot).mkString("", "\n", "\n"),
        StandardOpenOption.CREATE,
        StandardOpenOption.APPEND
      )
    }
    // keep the ledger BOUNDED: past a modest size, rewrite it as per-stream
    // ranges (coverage-preserving, idempotent). Size-gated so small ledgers
    // are not rewritten on every expiry; a compacted ledger stays under the
    // gate until months of new gaps/streams accumulate.
    val ledgerPath = manifestDir.resolve("lineage.log")
    if (Files.exists(ledgerPath) && Files.size(ledgerPath) > 64 * 1024) compactLineageLedgerLocked()
    // delete expired manifests
    assertLeaseHeld("expired-manifest delete")
    for (s <- expiring)
      Files.deleteIfExists(manifestDir.resolve(f"snapshot-${s.snapshotId}%09d.json"))
    // sweep orphaned commit temp files (a kill between tmp write and the
    // finally leaks them; nothing else reclaims .tmp-*) and stale-lock
    // graves (a stealer killed between rename and delete) — age-gated so a
    // concurrent in-flight commit's tmp is never touched
    val cutoff = System.currentTimeMillis() - 3600 * 1000L
    listDir(manifestDir)(
      _.filter(p => { val n = p.getFileName.toString; n.startsWith(".tmp-") || n.startsWith(".stale-lock-") }).toSeq
    ).foreach { p =>
      // a LIVE committer deletes its own tmp between our listing and the
      // stat — that is the tmp file working as designed, not an orphan
      try if (Files.getLastModifiedTime(p).toMillis < cutoff) Files.deleteIfExists(p)
      catch { case _: java.nio.file.NoSuchFileException => () }
    }
    // sweep crashed writers' staged copies: a kill during the staging write
    // leaks the whole .stage-* directory (a full data copy) that the
    // writer's in-process cleanup never reclaims, and nothing else lists
    // these siblings of data/. Age-gated by the SAME orphan gate as
    // unreferenced data files — on the NEWEST mtime found anywhere under
    // the stage dir, not the root's: directory mtimes refresh only on
    // direct-child create/delete, so a legitimate staging write whose
    // Spark job runs longer than the gate would read as stale at the root
    // while its leaf part-files are still being written. Any in-progress
    // write keeps producing fresh leaves, so a live dir never ages out; a
    // crashed writer's leaves all stop aging together.
    val stageCutoff = System.currentTimeMillis() - orphanFileGateMs
    val tableDir = Paths.get(s"$base/$table")
    assertLeaseHeld("orphan/stage/data-file delete sweep")
    if (Files.isDirectory(tableDir))
      listDir(tableDir)(_.filter(_.getFileName.toString.startsWith(".stage-")).toSeq).foreach { p =>
        try if (newestMtimeUnder(p) < stageCutoff) deleteRecursively(p)
        catch { case _: java.nio.file.NoSuchFileException => () }
      }
    // delete unreferenced data files (only snapshot-prefixed files are
    // manifest-tracked; leave any legacy files alone). Two provenance
    // classes, treated differently:
    //  - files the EXPIRING manifests referenced: committed and now
    //    expired — known dead, reclaimed immediately;
    //  - files NO manifest (kept or expiring) references: a LIVE writer
    //    moves its staged files into dataDir BEFORE its manifest CAS
    //    (moveStaged → hashFiles → commit is a seconds-to-minutes window),
    //    so a freshly-moved unreferenced file is most likely an IN-FLIGHT
    //    commit, not garbage — deleting it would let that commit land
    //    referencing dead files (silent data loss). These are AGE-GATED,
    //    the same reason Iceberg's remove_orphan_files has olderThan:
    //    young ones wait for the next cycle, true orphans (crashed
    //    writers) age past the gate and are reclaimed then
    //    (`orphanFileGateMs`, default a day — sized far above any real
    //    stage→hash→commit window, tunable for longer single commits).
    val expiredFiles = expiring.flatMap(s => s.partitions.flatMap(_.files)).toSet
    val orphanCutoff = System.currentTimeMillis() - orphanFileGateMs
    val dd = Paths.get(dataDir)
    if (!Files.isDirectory(dd)) return 0
    var deleted = 0
    listDir(dd)(_.filter(Files.isDirectory(_)).toSeq).foreach { partDir =>
      listDir(partDir)(_.toSeq).foreach { f =>
        val rel = s"${partDir.getFileName}/${f.getFileName}"
        val name = f.getFileName.toString
        if (name.startsWith("s") && name.endsWith(".parquet") && !referenced(rel)) {
          val orphanButYoung =
            !expiredFiles(rel) && {
              try Files.getLastModifiedTime(f).toMillis >= orphanCutoff
              catch { case _: java.nio.file.NoSuchFileException => true } // vanished — nothing to delete
            }
          if (!orphanButYoung && Files.deleteIfExists(f)) deleted += 1
        }
      }
      // drop a now-empty partition dir; a LIVE writer can be creating or
      // filling the same dir concurrently (moveStaged), so a
      // filled-in-between dir throws DirectoryNotEmpty — skip it, and
      // moveStaged recreates a deleted-under-it dir on its side
      if (listDir(partDir)(!_.hasNext))
        try Files.deleteIfExists(partDir)
        catch { case _: java.nio.file.DirectoryNotEmptyException => () }
    }
    deleted
  }

  /** Newest mtime of `p` or anything beneath it. A child vanishing during
    * the walk (the writer finishing and cleaning up its own stage dir) reads
    * as "fresh NOW" — the sweep must then skip this dir, never delete it.
    */
  private def newestMtimeUnder(p: java.nio.file.Path): Long =
    try {
      val own = Files.getLastModifiedTime(p).toMillis
      if (Files.isDirectory(p)) listDir(p)(_.toSeq).foldLeft(own)((m, c) => math.max(m, newestMtimeUnder(c)))
      else own
    } catch { case _: java.nio.file.NoSuchFileException => Long.MaxValue }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) listDir(p)(_.toSeq).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

/** hand-rolled JSON for the manifest files (offline: no JSON lib beyond what
  * Spark itself uses internally; format is trivial and versioned by key).
  */
object ManifestJson {
  def render(s: Snapshot): String = {
    val parts = s.partitions
      .map { p =>
        val fs = p.files.map(q).mkString("[", ",", "]")
        s"""{"p":${q(p.partition)},"rows":${p.rows},"hash":${p.contentHash},"files":$fs}"""
      }
      .mkString("[", ",", "]")
    // trailing "count" is an explicit TERMINATOR: every partition entry also
    // ends in `]}`, so "document ends with ]}" alone would accept a prefix
    // cut exactly at a partition-object boundary as a valid, SHORTER
    // manifest — silent data loss. A truncated body can never end in a
    // count field, and the count cross-checks the parsed partition list.
    // The LEADING "v":2 marker makes the check airtight across versions: it
    // lands in the first bytes, so any truncated prefix of a v2 body still
    // carries it and is rejected for its missing terminator — while genuine
    // pre-terminator manifests (no marker) keep parsing via the legacy path.
    // optional schema field (StructType.json, q()-escaped: its quotes render
    // as \" so the raw byte pattern of any field key can never appear inside
    // it — the substring-scanning parser stays unspoofable). Absent on
    // schema-less lineages; the count terminator stays the document tail.
    val schemaField = s.schemaJson.map(sj => s""""schema":${q(sj)},""").getOrElse("")
    s"""{"v":2,"snapshot_id":${s.snapshotId},"parent_id":${s.parentId},"input":${q(s.inputSnapshot)},$schemaField"partitions":$parts,"count":${s.partitions.length}}"""
  }

  /** strict parse; ALL malformed-input failures (truncation mid-token, bad
    * numbers, index overruns) normalize to IllegalArgumentException so
    * `readManifest`'s bounded retry covers the body-visibility window of the
    * non-link commit fallback uniformly.
    */
  def parse(json: String): Snapshot =
    try parseStrict(json)
    catch {
      case e: IllegalArgumentException => throw e
      case e @ (_: StringIndexOutOfBoundsException | _: IndexOutOfBoundsException | _: NumberFormatException) =>
        throw new IllegalArgumentException(s"malformed manifest JSON: ${e.getClass.getSimpleName}: ${e.getMessage}", e)
    }

  private def parseStrict(json: String): Snapshot = {
    def fieldPos(name: String, from: Int = 0): Int = {
      val i = json.indexOf("\"" + name + "\":", from)
      require(i >= 0, s"missing $name")
      i + name.length + 3
    }
    def longAt(pos: Int): Long =
      json.substring(pos).takeWhile(c => c.isDigit || c == '-').toLong
    // JSON string with \" and \\ escapes (the only ones q() emits);
    // returns (value, index just past the closing quote)
    def stringAt(pos: Int): (String, Int) = {
      require(json.charAt(pos) == '"', s"expected string at $pos")
      val sb = new StringBuilder
      var i = pos + 1
      while (json.charAt(i) != '"') {
        if (json.charAt(i) == '\\') { sb.append(json.charAt(i + 1)); i += 2 }
        else { sb.append(json.charAt(i)); i += 1 }
      }
      (sb.toString, i + 1)
    }
    // STRICT tail check: a truncated body (partial read of an in-progress
    // non-link commit, or byte truncation) must be rejected, not silently
    // parsed as a manifest with fewer partitions. Requiring the trailing
    // count terminator defeats the partition-boundary cut that a bare
    // "ends with ]}" check would accept. BACKWARD COMPAT: manifests written
    // before the terminator existed (no leading "v" marker, body ends in
    // `]}`) still parse — rejecting them would wedge every pre-upgrade table.
    // Their guarantee is what their writer provided (atomic link commits made
    // truncation a non-link-fallback-only window); a truncated v2 body can
    // never masquerade as one because the v marker sits in the first bytes.
    val trimmed = json.trim
    val hasCount = countTail.findFirstIn(trimmed).isDefined
    if (!hasCount) {
      require(!trimmed.startsWith("{\"v\":"), "truncated manifest JSON (missing count terminator)")
      require(trimmed.endsWith("]}"), "truncated manifest JSON")
      // the partition-boundary cut that "ends with ]}" alone would accept
      // leaves the outer object and the partitions array UNCLOSED — require
      // structural balance (outside strings), which every complete body of
      // any version has. This closes the truncation hole for count-less
      // legacy bodies AND for terminator-era bodies cut before their count.
      require(balancedJson(trimmed), "truncated manifest JSON (unbalanced)")
    }
    val id = longAt(fieldPos("snapshot_id"))
    val parent = longAt(fieldPos("parent_id"))
    val (input, _) = stringAt(fieldPos("input"))
    // optional schema (absent in pre-schema manifests); q()-escaping inside
    // string values keeps this raw-key scan unspoofable (see render)
    val schemaKey = json.indexOf("\"schema\":")
    val schema = if (schemaKey >= 0) Some(stringAt(schemaKey + 9)._1) else None
    var i = fieldPos("partitions") + 1 // past '['
    val parts = Seq.newBuilder[PartitionManifest]
    while (json.indexOf("\"p\":", i) >= 0) {
      val (p, afterP) = stringAt(fieldPos("p", i))
      val rows = longAt(fieldPos("rows", afterP))
      val hashPos = fieldPos("hash", afterP)
      // files array (absent in pre-file-tracking manifests → empty)
      val nextP = json.indexOf("\"p\":", hashPos)
      val filesKey = json.indexOf("\"files\":", hashPos)
      val files = Seq.newBuilder[String]
      if (filesKey >= 0 && (nextP < 0 || filesKey < nextP)) {
        var j = filesKey + 9 // past "files":[
        while (json.charAt(j) == '"') {
          val (f, after) = stringAt(j)
          files += f
          j = if (json.charAt(after) == ',') after + 1 else after
        }
      }
      parts += PartitionManifest(p, rows, longAt(hashPos), files.result())
      i = hashPos
    }
    val result = parts.result()
    // cross-check the terminator count against what was actually parsed: a
    // body cut inside the partitions array that somehow retained a count
    // tail, or a parser bug dropping entries, must fail loudly. Legacy
    // (pre-terminator) bodies have no count to check.
    if (hasCount) {
      val declared = longAt(fieldPos("count", i)) // i ≥ partitions-array start; escapes make a spoofed in-string key impossible
      require(declared == result.length, s"manifest count mismatch: declared $declared, parsed ${result.length}")
    }
    Snapshot(id, parent, input, result, schema)
  }

  /** the document must END in the count terminator */
  private val countTail = """"count":\d+\}$""".r

  /** braces/brackets balance with strings skipped (partition values may
    * contain raw brackets; q() escapes only quote and backslash)
    */
  private def balancedJson(json: String): Boolean = {
    var braces = 0
    var brackets = 0
    var inStr = false
    var i = 0
    while (i < json.length) {
      val c = json.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else
        c match {
          case '"' => inStr = true
          case '{' => braces += 1
          case '}' => braces -= 1
          case '[' => brackets += 1
          case ']' => brackets -= 1
          case _   => ()
        }
      i += 1
    }
    braces == 0 && brackets == 0 && !inStr
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c    => c.toString
    } + "\""
}
