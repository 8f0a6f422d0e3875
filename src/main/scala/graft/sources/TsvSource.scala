package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Try

/** S1-S3 (`FileDataLoader.java:25-120`): the reference's file-based source —
  * whitespace-split TSV with a header where column `ts` is the timestamp,
  * `regular` and any column starting with `error` are the two series — plus
  * the `.errors` / `.settings` JSON sidecars. Kept as a compatibility source
  * so a reference user can point the engine at their existing fixtures; the
  * primary source is the transcript table (pipeline.Derive).
  */
object TsvSource {

  /** the TSV is read through Spark, so the sidecar existence check must use
    * the SAME filesystem abstraction — a java.io.File test silently answers
    * "no" for every hdfs://, s3a://, or file:// URI and the sidecar labels
    * and settings would vanish without an error
    */
  private def isFile(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Try(fs.getFileStatus(path).isFile).getOrElse(false)
  }

  private def emptySeries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Long, Double)].toDF("scope", "metric", "bucket", "value")
  }

  /** read one reference-style TSV into long series points
    * (scope = file basename, metric ∈ {regular, error}).
    */
  def readSeries(spark: SparkSession, path: String): DataFrame = {
    val name = path.split("/").last
    // raw non-blank lines with positions; fixture files are tiny, so a
    // single-partition ordered read is fine for this compat source
    val lines = spark.read
      .text(path)
      .coalesce(1)
      .select(trim(col("value")).as("line"), monotonically_increasing_id().as("_ln"))
      .where(length(col("line")) > 0)

    // header = the FIRST NON-BLANK line (`FileDataLoader.java:86-89` skips
    // empty lines before the i == 0 mapping pass — a file starting with a
    // blank line still has its real header parsed); a file with no content
    // at all is an empty result, not an index crash
    val headerRow = lines.orderBy("_ln").limit(1).collect().headOption
    if (headerRow.isEmpty) return emptySeries(spark)
    val headerLn = headerRow.get.getLong(1)
    val cols = headerRow.get.getString(0).split("\\s+")
    // LAST matching token wins for ALL THREE columns: the reference maps the
    // header in one per-token loop that overwrites the index variable
    // (`FileDataLoader.java:96-104`), so later duplicates shadow earlier ones
    val tsIdx = cols.lastIndexOf("ts")
    val regularIdx = cols.lastIndexOf("regular")
    val errorIdx = cols.lastIndexWhere(_.startsWith("error"))
    require(tsIdx >= 0, s"no ts column in $path")

    // skip the header LINE by position, not by textual equality (a data line
    // that happens to equal the header must survive)
    val rows = lines
      .where(col("_ln") > headerLn)
      .select(split(col("line"), "\\s+").as("c"), col("_ln"))

    val metrics = Seq(
      if (regularIdx >= 0) Some(("regular", regularIdx)) else None,
      if (errorIdx >= 0) Some(("error", errorIdx)) else None
    ).flatten
    // a header with ts but neither regular nor error* is a valid empty
    // source in the reference (both raw maps just stay empty) — not a crash
    if (metrics.isEmpty) return emptySeries(spark)

    // exact-duplicate raw timestamps: the LAST line wins — the reference
    // keys raw rows by the ts STRING (`FileDataLoader.java:107-113`,
    // HashMap.put), so a repeated ts replaces, it does not sum (summing is
    // the DOWNSTREAM bucket behavior for DISTINCT ts in one bucket, O3)
    val wTs = Window.partitionBy("_ts_raw").orderBy(col("_ln").desc)
    metrics
      .map { case (metric, idx) =>
        rows
          .select(
            element_at(col("c"), tsIdx + 1).as("_ts_raw"),
            element_at(col("c"), idx + 1).cast("double").as("value"),
            col("_ln")
          )
          .withColumn("_rn", row_number().over(wTs))
          .where(col("_rn") === 1)
          .select(
            lit(name).as("scope"),
            lit(metric).as("metric"),
            col("_ts_raw").cast("long").as("bucket"),
            col("value")
          )
      }
      .reduce(_.unionByName(_))
  }

  /** Coerce one JSON array element the way gson's `getAsLong` does: numbers
    * truncate via longValue, strings go through Long.parseLong (so "123"
    * passes but "1.5" or "abc" throws).
    */
  private def toLongLikeGson(v: Any): Long = v match {
    case n: java.lang.Number => n.longValue()
    case s: String           => java.lang.Long.parseLong(s)
    case other               => throw new IllegalArgumentException(s"not a long: $other")
  }

  /** `.errors` sidecar → expected outlier timestamps (S2). Whole-file parse
    * failures (invalid JSON, missing/non-array `errors`) mirror the
    * reference's catch-all → empty; a bad ELEMENT mid-array keeps the prefix
    * already accumulated, exactly like the reference's catch around the add
    * loop (`FileDataLoader.java:25-43` — `list` holds prior adds when
    * `getAsLong` throws).
    */
  def readExpectedErrors(spark: SparkSession, tsvPath: String): Seq[Long] = {
    val p = s"$tsvPath.errors"
    if (!isFile(spark, p)) Seq.empty
    else
      Try {
        val df = spark.read.option("multiLine", true).json(p)
        if (!df.columns.contains("errors")) Seq.empty[Long]
        else {
          val vals = df.select(explode(col("errors")).as("ts")).collect().map(_.get(0))
          vals.iterator
            .map(v => Try(toLongLikeGson(v)))
            .takeWhile(_.isSuccess)
            .map(_.get)
            .toVector
        }
      }.getOrElse(Seq.empty)
  }

  /** `.settings` sidecar → flat string map (S3). Empty/row-less/malformed
    * sidecars mirror the reference's catch-all → empty map
    * (`FileDataLoader.java:45-64`); Spark's `_corrupt_record` marker column
    * is never a settings key. One documented deviation: a NESTED value (an
    * object or array, outside the flat-primitive contract) is stringified
    * here, while the reference's `getAsString` throws and keeps the partial
    * map built so far — Spark alphabetizes inferred JSON fields, so the
    * reference's insertion-order prefix is not reproducible.
    */
  def readSettings(spark: SparkSession, tsvPath: String): Map[String, String] = {
    val p = s"$tsvPath.settings"
    if (!isFile(spark, p)) Map.empty
    else
      Try {
        val df = spark.read.option("multiLine", true).json(p)
        val keys = df.columns.filterNot(_ == "_corrupt_record")
        df.collect().headOption match {
          case None => Map.empty[String, String]
          case Some(row) => keys.map(c => c -> String.valueOf(row.getAs[Any](c))).toMap
        }
      }.getOrElse(Map.empty)
  }
}
