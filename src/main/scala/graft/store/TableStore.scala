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

    // manifest from what is NOW on disk (covers resumed + fresh partitions)
    val onDisk = spark.read.parquet(dataDir)
    val hashCols = onDisk.columns.sorted.map(col).toSeq
    val manifest = onDisk
      .groupBy(col(partitionCol).cast("string").as("p"))
      .agg(count(lit(1)).as("rows"), bit_xor(xxhash64(hashCols: _*)).as("h"))
      .collect()
      .map(r => PartitionManifest(r.getAs[String]("p"), r.getAs[Long]("rows"), r.getAs[Long]("h")))
      .sortBy(_.partition)
      .toSeq

    val parent = currentSnapshot.map(_.snapshotId).getOrElse(-1L)
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
    val onDisk = spark.read.parquet(dataDir)
    val hashCols = onDisk.columns.sorted.map(col).toSeq
    val manifest = onDisk
      .groupBy(col(partitionCol).cast("string").as("p"))
      .agg(count(lit(1)).as("rows"), bit_xor(xxhash64(hashCols: _*)).as("h"))
      .collect()
      .map(r => PartitionManifest(r.getAs[String]("p"), r.getAs[Long]("rows"), r.getAs[Long]("h")))
      .sortBy(_.partition)
      .toSeq
    val parent = currentSnapshot.map(_.snapshotId).getOrElse(-1L)
    val snap = Snapshot(parent + 1, parent, inputSnapshot, manifest)
    Files.writeString(
      manifestDir.resolve(f"snapshot-${snap.snapshotId}%09d.json"),
      ManifestJson.render(snap),
      StandardOpenOption.CREATE,
      StandardOpenOption.TRUNCATE_EXISTING
    )
    snap
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
    def field(name: String): String = {
      val i = json.indexOf("\"" + name + "\":")
      require(i >= 0, s"missing $name")
      json.substring(i + name.length + 3)
    }
    val id = field("snapshot_id").takeWhile(c => c.isDigit || c == '-').toLong
    val parent = field("parent_id").takeWhile(c => c.isDigit || c == '-').toLong
    val inputRaw = field("input").drop(1)
    val input = inputRaw.takeWhile(_ != '"')
    val partsBlob = field("partitions")
    val partRe = """\{"p":"([^"]*)","rows":(-?\d+),"hash":(-?\d+)\}""".r
    val parts = partRe
      .findAllMatchIn(partsBlob)
      .map(m => PartitionManifest(m.group(1), m.group(2).toLong, m.group(3).toLong))
      .toSeq
    Snapshot(id, parent, input, parts)
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c    => c.toString
    } + "\""
}
