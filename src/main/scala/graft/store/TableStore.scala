package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Iceberg-shaped table format, offline realization (no Iceberg runtime in
  * this sandbox — SURVEY env facts): partitioned Parquet data files plus our
  * own manifest/snapshot JSON giving the north_rule's per-partition
  * checkpoint manifests with lineage + row counts + content hashes. The
  * interface is kept at Iceberg granularity (scan / append / overwrite
  * partitions / snapshot ids) so an Iceberg binding can replace the offline
  * implementation without touching callers.
  *
  * Layout:
  *   <base>/<table>/data/<part>=<v>/part-*.parquet   (dynamic overwrite)
  *   <base>/<table>/_manifests/snapshot-<k>.json
  *
  * Content hash per partition = bit_xor(xxhash64(all columns)) — order- and
  * partitioning-insensitive, so "rebuild produced identical content" is
  * checkable without byte-comparing files (parquet task file names contain
  * fresh UUIDs by design).
  */
final case class PartitionManifest(partition: String, rows: Long, contentHash: Long)

final case class Snapshot(
    snapshotId: Long,
    parentId: Long, // -1 = none
    inputSnapshot: String, // lineage: identifier of the input this was built from
    partitions: Seq[PartitionManifest]
)

final class TableStore(base: String, table: String) {

  private def dataDir = s"$base/$table/data"
  private def manifestDir = Paths.get(s"$base/$table/_manifests")

  // ---- snapshot bookkeeping -------------------------------------------------

  def snapshots: Seq[Snapshot] =
    if (!Files.isDirectory(manifestDir)) Seq.empty
    else
      Files
        .list(manifestDir)
        .iterator()
        .asScala
        .filter(_.getFileName.toString.startsWith("snapshot-"))
        .toSeq
        .sortBy(_.getFileName.toString)
        .map(p => ManifestJson.parse(Files.readString(p)))
        .sortBy(_.snapshotId)

  def currentSnapshot: Option[Snapshot] = snapshots.lastOption

  /** partitions already built from this input (resume = skip these) */
  def completedPartitions(inputSnapshot: String): Set[String] =
    currentSnapshot
      .filter(_.inputSnapshot == inputSnapshot)
      .map(_.partitions.map(_.partition).toSet)
      .getOrElse(Set.empty)

  // ---- IO --------------------------------------------------------------------

  def read(spark: SparkSession): DataFrame = spark.read.parquet(dataDir)

  /** Write df partitioned by `partitionCol` with dynamic partition overwrite
    * (idempotent per-partition), then record a new snapshot whose manifest
    * carries per-partition row counts + content hashes + input lineage.
    * `onlyPartitions`, when set, restricts the write to those partitions
    * (resume path: everything else is already on disk).
    */
  def write(
      df: DataFrame,
      partitionCol: String,
      inputSnapshot: String,
      onlyPartitions: Option[Set[String]] = None
  ): Snapshot = {
    val spark = df.sparkSession
    val toWrite = onlyPartitions match {
      case Some(ps) if ps.nonEmpty => df.where(col(partitionCol).cast("string").isin(ps.toSeq: _*))
      case Some(_)                 => df.where(lit(false))
      case None                    => df
    }
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    toWrite.write.mode("overwrite").partitionBy(partitionCol).parquet(dataDir)

    // INCREMENTAL manifest: hash only the partitions just written and merge
    // the parent snapshot's entries for untouched ones. Re-scanning the full
    // table per commit is O(table) — a scale-killer at 100 TB; dynamic
    // overwrite leaves untouched partitions byte-identical, so their parent
    // manifest entries remain valid (this is exactly what Iceberg manifests
    // buy: commit cost proportional to the delta, not the table).
    val writtenParts: Set[String] = onlyPartitions.getOrElse(
      df.select(col(partitionCol).cast("string")).distinct().collect().map(_.getString(0)).toSet
    )
    val fresh =
      if (writtenParts.isEmpty) Seq.empty[PartitionManifest]
      else {
        val paths = writtenParts.toSeq.sorted.map(p => s"$dataDir/$partitionCol=$p")
        hashPartitions(spark.read.option("basePath", dataDir).parquet(paths: _*), partitionCol)
      }
    val parentSnap = currentSnapshot
    val inherited = parentSnap
      .map(_.partitions.filterNot(p => writtenParts(p.partition)))
      .getOrElse(Seq.empty)
    val manifest = (inherited ++ fresh).sortBy(_.partition)

    writeSnapshot(parentSnap, inputSnapshot, manifest)
  }

  /** per-partition (rows, content hash) for the given data only */
  private def hashPartitions(onDisk: DataFrame, partitionCol: String): Seq[PartitionManifest] = {
    val hashCols = onDisk.columns.sorted.map(col).toSeq
    onDisk
      .groupBy(col(partitionCol).cast("string").as("p"))
      .agg(count(lit(1)).as("rows"), bit_xor(xxhash64(hashCols: _*)).as("h"))
      .collect()
      .map(r => PartitionManifest(r.getAs[String]("p"), r.getAs[Long]("rows"), r.getAs[Long]("h")))
      .sortBy(_.partition)
      .toSeq
  }

  private def writeSnapshot(parentSnap: Option[Snapshot], inputSnapshot: String, manifest: Seq[PartitionManifest]): Snapshot = {
    val parent = parentSnap.map(_.snapshotId).getOrElse(-1L)
    val snap = Snapshot(parent + 1, parent, inputSnapshot, manifest)
    Files.createDirectories(manifestDir)
    Files.writeString(
      manifestDir.resolve(f"snapshot-${snap.snapshotId}%09d.json"),
      ManifestJson.render(snap),
      StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING
    )
    snap
  }

  /** Small-file compaction: rewrite one partition's data files into
    * `targetFiles` (streaming/foreachBatch appends accumulate one file per
    * micro-batch per task — at 100 TB that's a scan-planning and NameNode/
    * listing tax). Content-identical by construction; the new snapshot
    * carries a freshly computed manifest entry for the partition (hash must
    * equal the parent's — the spec asserts it) and inherits everything else.
    */
  def compactPartition(spark: SparkSession, partitionCol: String, partition: String, targetFiles: Int = 1): Snapshot = {
    val partDir = Paths.get(s"$dataDir/$partitionCol=$partition")
    require(Files.isDirectory(partDir), s"no partition $partitionCol=$partition")
    val tmp = Paths.get(s"$base/$table/.compact_$partition")
    deleteRecursively(tmp)
    spark.read
      .parquet(partDir.toString)
      .coalesce(targetFiles)
      .write
      .parquet(tmp.toString)
    deleteRecursively(partDir)
    Files.move(tmp, partDir)

    val fresh = hashPartitions(
      spark.read.option("basePath", dataDir).parquet(partDir.toString),
      partitionCol
    )
    val parentSnap = currentSnapshot
    val inherited = parentSnap.map(_.partitions.filterNot(_.partition == partition)).getOrElse(Seq.empty)
    writeSnapshot(parentSnap, parentSnap.map(_.inputSnapshot).getOrElse("compaction"), (inherited ++ fresh).sortBy(_.partition))
  }

  /** data-file count for one partition (compaction targeting/observability) */
  def partitionFileCount(partitionCol: String, partition: String): Int = {
    val d = Paths.get(s"$dataDir/$partitionCol=$partition")
    if (!Files.isDirectory(d)) 0
    else Files.list(d).iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
  }

  /** TTL demotion: drop data partitions older than `cutoff` (the coarser
    * tier covering them must have been built first — caller's contract).
    * Records a new snapshot without the dropped partitions.
    */
  def dropPartitionsOlderThan(spark: SparkSession, partitionCol: String, cutoff: String, inputSnapshot: String): Snapshot = {
    val dir = Paths.get(dataDir)
    if (Files.isDirectory(dir)) {
      Files
        .list(dir)
        .iterator()
        .asScala
        .filter { p =>
          val name = p.getFileName.toString
          name.startsWith(s"$partitionCol=") && name.stripPrefix(s"$partitionCol=") < cutoff
        }
        .foreach(deleteRecursively)
    }
    // metadata-only commit: dropped partitions leave the survivors untouched,
    // so the new manifest is the parent's entries filtered — no table scan.
    val parentSnap = currentSnapshot
    val manifest = parentSnap
      .map(_.partitions.filter(_.partition >= cutoff))
      .getOrElse(hashPartitions(spark.read.parquet(dataDir), partitionCol))
    writeSnapshot(parentSnap, inputSnapshot, manifest)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

/** hand-rolled JSON for the manifest files (offline: no JSON lib beyond what
  * Spark itself uses internally; format is trivial and versioned by key).
  */
object ManifestJson {
  def render(s: Snapshot): String = {
    val parts = s.partitions
      .map(p => s"""{"p":${q(p.partition)},"rows":${p.rows},"hash":${p.contentHash}}""")
      .mkString("[", ",", "]")
    s"""{"snapshot_id":${s.snapshotId},"parent_id":${s.parentId},"input":${q(s.inputSnapshot)},"partitions":$parts}"""
  }

  def parse(json: String): Snapshot = {
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
    val id = longAt(fieldPos("snapshot_id"))
    val parent = longAt(fieldPos("parent_id"))
    val (input, _) = stringAt(fieldPos("input"))
    var i = fieldPos("partitions") + 1 // past '['
    val parts = Seq.newBuilder[PartitionManifest]
    while (json.indexOf("\"p\":", i) >= 0) {
      val (p, afterP) = stringAt(fieldPos("p", i))
      val rows = longAt(fieldPos("rows", afterP))
      val hashPos = fieldPos("hash", afterP)
      parts += PartitionManifest(p, rows, longAt(hashPos))
      i = hashPos
    }
    Snapshot(id, parent, input, parts.result())
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c    => c.toString
    } + "\""
}
