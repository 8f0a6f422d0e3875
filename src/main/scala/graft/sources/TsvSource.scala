package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1-S3 (`FileDataLoader.java:25-120`): the reference's file-based source —
  * whitespace-split TSV with a header where column `ts` is the timestamp,
  * `regular` and any column starting with `error` are the two series — plus
  * the `.errors` / `.settings` JSON sidecars. Kept as a compatibility source
  * so a reference user can point the engine at their existing fixtures; the
  * primary source is the transcript table (pipeline.Derive).
  */
object TsvSource {

  /** read one reference-style TSV into long series points
    * (scope = file basename, metric ∈ {regular, error}).
    */
  def readSeries(spark: SparkSession, path: String): DataFrame = {
    val name = path.split("/").last
    // header-driven column mapping, reference semantics (`FileDataLoader.java:94-105`)
    val headerLine = spark.read.text(path).limit(1).collect()(0).getString(0).trim
    val cols = headerLine.split("\\s+")
    val tsIdx = cols.indexOf("ts")
    val regularIdx = cols.indexOf("regular")
    // LAST matching error column wins (`FileDataLoader.java:101` overwrites
    // the map entry per header token, so later columns shadow earlier ones)
    val errorIdx = cols.lastIndexWhere(_.startsWith("error"))
    require(tsIdx >= 0, s"no ts column in $path")

    // skip the header LINE by position, not by textual equality (a data line
    // that happens to equal the header must survive); fixture files are tiny,
    // so a single-partition ordered read is fine for this compat source
    val rows = spark.read
      .text(path)
      .coalesce(1)
      .select(trim(col("value")).as("line"), monotonically_increasing_id().as("_ln"))
      .where(col("_ln") > 0 && length(col("line")) > 0)
      .select(split(col("line"), "\\s+").as("c"))

    val metrics = Seq(
      if (regularIdx >= 0) Some(("regular", regularIdx)) else None,
      if (errorIdx >= 0) Some(("error", errorIdx)) else None
    ).flatten
    metrics
      .map { case (metric, idx) =>
        rows.select(
          lit(name).as("scope"),
          lit(metric).as("metric"),
          element_at(col("c"), tsIdx + 1).cast("long").as("bucket"),
          element_at(col("c"), idx + 1).cast("double").as("value")
        )
      }
      .reduce(_.unionByName(_))
  }

  /** `.errors` sidecar → expected outlier timestamps (S2). */
  def readExpectedErrors(spark: SparkSession, tsvPath: String): Seq[Long] = {
    val p = s"$tsvPath.errors"
    if (!new java.io.File(p).isFile) Seq.empty
    else {
      val df = spark.read.option("multiLine", true).json(p)
      if (!df.columns.contains("errors")) Seq.empty
      else df.select(explode(col("errors")).as("ts")).collect().map(_.getLong(0)).toSeq
    }
  }

  /** `.settings` sidecar → flat string map (S3). */
  def readSettings(spark: SparkSession, tsvPath: String): Map[String, String] = {
    val p = s"$tsvPath.settings"
    if (!new java.io.File(p).isFile) Map.empty
    else {
      val df = spark.read.option("multiLine", true).json(p)
      val row = df.collect()(0)
      df.columns.map(c => c -> String.valueOf(row.getAs[Any](c))).toMap
    }
  }
}
