package graft.store

import graft.spark.SparkTestBase
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._

/** Seeded model-based fuzz of the TableStore state machine: each seed runs a
  * random sequence of the ops production performs over a table's lifetime —
  * overwrite writes, partial (onlyPartitions) rewrites, streaming-shaped
  * appends, small-file compaction, TTL demotion, snapshot expiry — against a
  * driver-side model (per-partition value multisets), asserting after EVERY
  * op that the manifest (partition set + row counts), the current read-back
  * (per-partition count and sum), and retained time-travel snapshots all
  * equal the model. The curated [[TableStoreSpec]] pins each mechanism in
  * isolation (incl. concurrency races); this sweeps their INTERLEAVINGS —
  * the compaction-after-append-after-TTL orderings nobody curates. The
  * null-day partition (__HIVE_DEFAULT_PARTITION__) participates like any
  * other key.
  */
class TableStoreRandomOpsSpec extends SparkTestBase {

  /** sweep width: 3 by default (each seed is a full op sequence with a
    * read-back check per op); widen via `-Dgraft.randFixtures=25`
    */
  private val N = sys.props.getOrElse("graft.randFixtures", "3").toInt

  private val NullKey = ExternalCatalogUtils.DEFAULT_PARTITION_NAME
  private val DayPool = (1 to 6).map(d => f"2024-01-$d%02d") :+ NullKey

  private def mkDf(rows: Seq[(String, Long)]) = {
    val s = spark
    import s.implicits._
    rows
      .map { case (day, v) => (if (day == NullKey) Option.empty[String] else Some(day), v) }
      .toDF("day", "v")
  }

  for (seed <- 0 until N) {
    test(s"seed $seed: random write/append/compact/ttl/expire sequence preserves the model at every step") {
      val rnd = new scala.util.Random(0x57AB1E + seed * 104729)
      val base = java.nio.file.Files.createTempDirectory("graft_store_fuzz").toString
      // tier_-prefixed so a Maintain.run cycle can ride the same table
      val store = new TableStore(base, "tier_fz")

      // model: partition -> multiset of v values currently CURRENT
      val model = scala.collection.mutable.Map.empty[String, Vector[Long]]
      // model: streamId -> last watermark batch id set
      val wmModel = scala.collection.mutable.Map.empty[String, Long]
      // committed history for time-travel checks: snapshotId -> model copy
      val history = scala.collection.mutable.Map.empty[Long, Map[String, Vector[Long]]]
      val lineageIds = scala.collection.mutable.ArrayBuffer.empty[String]
      var lastSnapshotId = -1L
      var nextV = 0L

      def freshValues(n: Int): Vector[Long] = Vector.fill(n) { nextV += 1; nextV }
      def pickDays(n: Int): Seq[String] = rnd.shuffle(DayPool).take(n)

      // call AFTER applying the op to the model: the history entry is the
      // state that snapshot committed
      def recordCommit(s: Snapshot): Unit = {
        assert(s.snapshotId > lastSnapshotId, s"snapshot ids must increase: ${s.snapshotId} after $lastSnapshotId")
        lastSnapshotId = s.snapshotId
        history(s.snapshotId) = model.view.mapValues(identity).toMap
      }

      def readBack(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
        df.groupBy(col("day").cast("string").as("d"))
          .agg(count(lit(1)).as("n"), sum("v").as("s"))
          .collect()
          .map(r => (Option(r.getString(0)).getOrElse(NullKey), (r.getLong(1), r.getLong(2))))
          .toMap

      def expected(m: Map[String, Vector[Long]]): Map[String, (Long, Long)] =
        m.map { case (k, vs) => k -> ((vs.size.toLong, vs.sum)) }

      // seed the table with an initial write: maintenance-style first ops
      // (expire/compact/ttl) against a NEVER-written store either no-op or
      // read a nonexistent dataDir, which is a documented loud error (a
      // typo'd storeBase must not read as an empty table), not fuzz target
      {
        val days = pickDays(1 + rnd.nextInt(2))
        val rows = days.flatMap(d => freshValues(1 + rnd.nextInt(5)).map(d -> _))
        val snap = store.write(mkDf(rows), "day", s"seed-$seed")
        lineageIds += s"seed-$seed"
        days.foreach(d => model(d) = rows.filter(_._1 == d).map(_._2).toVector)
        recordCommit(snap)
      }

      def check(opDesc: String): Unit = {
        val parts = store.currentSnapshot.map(_.partitions).getOrElse(Seq.empty)
        assert(parts.map(_.partition).toSet == model.keySet,
          s"seed $seed after $opDesc: manifest partitions ${parts.map(_.partition).sorted} != model ${model.keys.toSeq.sorted}")
        for (p <- parts)
          assert(p.rows == model(p.partition).size,
            s"seed $seed after $opDesc: manifest rows for ${p.partition} = ${p.rows}, model ${model(p.partition).size}")
        val back = readBack(store.read(spark))
        assert(back == expected(model.toMap), s"seed $seed after $opDesc: read-back $back != model ${expected(model.toMap)}")
        // manifest-schema invariant (round 7): after the seed write every
        // current snapshot carries a schema, it never contains NullType (a
        // null-only-partition delta infers VOID; reconcileSchema must heal
        // it against the parent in EVERY interleaving this fuzz reaches),
        // and the column types are exactly the table's real shape
        import org.apache.spark.sql.types.{DataType, DateType, LongType, StringType, StructType}
        val sj = store.currentSnapshot.flatMap(_.schemaJson)
        assert(sj.nonEmpty, s"seed $seed after $opDesc: current snapshot carries no manifest schema")
        assert(!sj.get.contains("\"void\""),
          s"seed $seed after $opDesc: manifest schema carries NullType: ${sj.get}")
        val st = DataType.fromJson(sj.get).asInstanceOf[StructType]
        // day is DATE when the read-back's partition-type inference saw real
        // 2024-01-dd dir values (what every reader of those files sees), and
        // STRING via the null-only / healed-void fallback; v is LONG except
        // after a poison+heal whose typed ancestors were all expired (the
        // string fallback — the poison op itself asserts exact recovery
        // whenever a typed ancestor was retained). Void never is legitimate.
        assert(Set[org.apache.spark.sql.types.DataType](StringType, DateType)(st("day").dataType) &&
          Set[org.apache.spark.sql.types.DataType](LongType, StringType)(st("v").dataType),
          s"seed $seed after $opDesc: manifest schema types drifted: ${sj.get}")
      }

      for (k <- 0 until 12) {
        val lineage = s"op-$seed-$k"
        rnd.nextInt(100) match {
          case r if r < 25 => // overwrite write of 1-3 partitions
            val days = pickDays(1 + rnd.nextInt(3))
            val rows = days.flatMap(d => freshValues(1 + rnd.nextInt(8)).map(d -> _))
            val snap = store.write(mkDf(rnd.shuffle(rows)), "day", lineage)
            lineageIds += lineage
            days.foreach(d => model(d) = rows.filter(_._1 == d).map(_._2).toVector)
            recordCommit(snap)
            check(s"op$k overwrite($days)")
          case r if r < 45 => // partial rewrite: df spans days, commit filters to a subset
            val days = pickDays(2 + rnd.nextInt(2))
            val subset = rnd.shuffle(days).take(1 + rnd.nextInt(days.size)).toSet
            val rows = days.flatMap(d => freshValues(1 + rnd.nextInt(6)).map(d -> _))
            val snap = store.write(mkDf(rnd.shuffle(rows)), "day", lineage, onlyPartitions = Some(subset))
            lineageIds += lineage
            subset.foreach(d => model(d) = rows.filter(_._1 == d).map(_._2).toVector)
            recordCommit(snap)
            check(s"op$k partialRewrite($subset of $days)")
          case r if r < 64 => // streaming-shaped append to 1-2 partitions
            // half the appends carry a stream-<id>-batch-<n> lineage so the
            // watermark GC's liveness rule has real stream history to consult
            val streamed = rnd.nextBoolean()
            val lin = if (streamed) s"stream-fz${rnd.nextInt(3)}-batch-$k" else lineage
            val days = pickDays(1 + rnd.nextInt(2))
            val rows = days.flatMap(d => freshValues(1 + rnd.nextInt(5)).map(d -> _))
            val snap = store.write(mkDf(rnd.shuffle(rows)), "day", lin, append = true)
            lineageIds += lin
            days.foreach(d => model(d) = model.getOrElse(d, Vector.empty) ++ rows.filter(_._1 == d).map(_._2))
            recordCommit(snap)
            check(s"op$k append($days, lineage=$lin)")
          case r if r < 70 => // watermark set + round-trip, or a stale-sweep GC
            if (rnd.nextBoolean() || wmModel.isEmpty) {
              val sid = s"fz${rnd.nextInt(3)}"
              store.setStreamWatermark(sid, k.toLong)
              wmModel(sid) = k.toLong
              assert(store.streamWatermark(sid).contains(k.toLong), s"seed $seed op$k: watermark $sid round-trip")
            } else {
              // maxAge -10ms => every non-live watermark is stale RIGHT NOW;
              // live = a RETAINED snapshot carries stream-<sid>-batch-<n>
              val live = store.snapshots.map(_.inputSnapshot).collect {
                case l if l.startsWith("stream-") && l.contains("-batch-") =>
                  l.stripPrefix("stream-").substring(0, l.stripPrefix("stream-").lastIndexOf("-batch-"))
              }.toSet
              store.gcStreamWatermarks(maxAgeMs = -10L)
              for ((sid, v) <- wmModel.toSeq) {
                if (live(sid))
                  assert(store.streamWatermark(sid).contains(v), s"seed $seed op$k: live watermark $sid swept")
                else {
                  assert(store.streamWatermark(sid).isEmpty, s"seed $seed op$k: dead watermark $sid survived a 0-age GC")
                  wmModel.remove(sid)
                }
              }
            }
          case r if r < 80 => // compact a fragmented partition (content-identical)
            model.keys.find(store.partitionFileCount("day", _) > 1) match {
              case Some(day) =>
                recordCommit(store.compactPartition(spark, "day", day))
                assert(store.partitionFileCount("day", day) == 1, s"seed $seed op$k: compaction left >1 file")
                check(s"op$k compact($day)")
              case None => () // nothing fragmented — no-op step
            }
          case r if r < 90 => // TTL demotion at a random cutoff (string >=, like production)
            val cutoff = DayPool(rnd.nextInt(DayPool.size - 1)) // real days only
            val snap = store.dropPartitionsOlderThan(spark, "day", cutoff, lineage)
            lineageIds += lineage
            model.keys.toSeq.filter(_ < cutoff).foreach(model.remove)
            recordCommit(snap)
            check(s"op$k ttl($cutoff)")
          case r if r < 95 => // snapshot expiry: current content must be untouched
            val keep = 1 + rnd.nextInt(3)
            store.expireSnapshots(keepLast = keep)
            check(s"op$k expire(keepLast=$keep)")
          case r if r < 97 => // poison the manifest schema on disk (a pre-reconcile
            // build's verbatim VOID record), then heal via the next commit —
            // interleaved with every other op class, unlike the curated spec
            import org.apache.spark.sql.types.{DataType, NullType, StructType}
            val cur = store.currentSnapshot.get
            val poisonCol = if (rnd.nextBoolean()) "day" else "v"
            val st = DataType.fromJson(cur.schemaJson.get).asInstanceOf[StructType]
            val voided = StructType(st.fields.map(f => if (f.name == poisonCol) f.copy(dataType = NullType) else f))
            val path = java.nio.file.Paths.get(f"$base/tier_fz/_manifests/snapshot-${cur.snapshotId}%09d.json")
            java.nio.file.Files.writeString(path, ManifestJson.render(cur.copy(schemaJson = Some(voided.json))))
            assert(store.currentSnapshot.get.schemaJson.get.contains("\"void\""), s"seed $seed op$k: poisoning precondition")
            // the type the lineage walk must recover = the NEWEST retained
            // ancestor's non-void type for the field (the poisoned current
            // never matches). None = all typed ancestors expired → the
            // documented string fallback applies. Matching the walk's exact
            // pick matters: an earlier string-fallback heal in THIS seed's
            // history legitimately makes the recoverable type string, not
            // the column's original long.
            val recoverableType = store.snapshots.sortBy(-_.snapshotId).iterator
              .flatMap(_.schemaJson)
              .flatMap(j => DataType.fromJson(j).asInstanceOf[StructType].fields
                .find(f => f.name == poisonCol && f.dataType != NullType).map(_.dataType))
              .nextOption()
            // heal path drawn at random: a metadata-only commit (propagates +
            // sanitizes the parent schema) or a fresh append (delta read-back
            // wins; its non-void fields override the poisoned parent's)
            if (rnd.nextBoolean()) {
              val snap = store.dropPartitionsOlderThan(spark, "day", "1900-01-01", lineage) // drops nothing
              lineageIds += lineage
              recordCommit(snap)
              check(s"op$k poison($poisonCol)+heal(metadata-only)")
              // a retained typed ancestor ⇒ the lineage walk recovers that
              // EXACT type, never the blanket string fallback
              recoverableType.foreach { t =>
                val healed = DataType.fromJson(store.currentSnapshot.get.schemaJson.get).asInstanceOf[StructType]
                assert(healed(poisonCol).dataType == t,
                  s"seed $seed op$k: recoverable poisoned $poisonCol healed to ${healed(poisonCol).dataType}, walk should find $t")
              }
            } else {
              val days = pickDays(1)
              val rows = days.flatMap(d => freshValues(1 + rnd.nextInt(3)).map(d -> _))
              val snap = store.write(mkDf(rows), "day", lineage, append = true)
              lineageIds += lineage
              days.foreach(d => model(d) = model.getOrElse(d, Vector.empty) ++ rows.filter(_._1 == d).map(_._2))
              recordCommit(snap)
              check(s"op$k poison($poisonCol)+heal(append)")
            }
          case _ => // a full Maintain cycle (ttl + compact + expire + wm GC at default age)
            val cutoff = DayPool(rnd.nextInt(DayPool.size - 1))
            graft.jobs.Maintain.run(spark, base, "fz", maxFiles = 2, keepSnapshots = 2, ttlCutoff = Some(cutoff))
            model.keys.toSeq.filter(_ < cutoff).foreach(model.remove)
            lastSnapshotId = store.currentSnapshot.map(_.snapshotId).getOrElse(lastSnapshotId)
            // fresh watermarks survive the default-age GC inside the cycle
            for ((sid, v) <- wmModel)
              assert(store.streamWatermark(sid).contains(v), s"seed $seed op$k: maintain swept fresh watermark $sid")
            check(s"op$k maintain(cutoff=$cutoff)")
        }
      }

      // retained snapshots time-travel to exactly the model they committed
      val retained = store.snapshots.map(_.snapshotId)
      assert(retained == retained.sorted && retained.distinct == retained, s"snapshot ids must be ordered unique: $retained")
      for (id <- retained if history.contains(id)) {
        val back = readBack(store.read(spark, id))
        assert(back == expected(history(id)), s"seed $seed: time travel to $id diverged: $back != ${expected(history(id))}")
      }
      // every committed lineage id stays queryable (replay guard, across ledger compaction)
      for (l <- lineageIds) assert(store.hasCommit(l), s"seed $seed: lineage $l lost")
    }
  }
}
