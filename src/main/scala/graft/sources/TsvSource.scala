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

  /** Sidecars are tiny driver-side config files — read them whole through the
    * Hadoop FS (same abstraction as [[isFile]]) rather than spinning up a
    * distributed JSON scan for a 50-byte file.
    */
  private def readWholeFile(spark: SparkSession, p: String): String = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(path)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
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
    // single-partition ordered read is fine for this compat source.
    // NOT plain trim(col): Spark's one-arg trim strips only ' ' while the
    // reference's Java String.trim (`FileDataLoader.java:84-86`) strips
    // every char <= U+0020 — a tab-padded line must lose its padding (else
    // \s+ splitting yields a phantom leading cell and every column shifts)
    // and a tab-only line must read as blank and be skipped, exactly like
    // the reference. The two-arg trim with the explicit U+0000..U+0020 char
    // set is that rule, codegen'd (a regexp_replace here measured ~1.5x
    // slower on the driver bench)
    val javaTrimChars = (0x00 to 0x20).map(_.toChar).mkString
    val lines = spark.read
      .text(path)
      .coalesce(1)
      .select(
        trim(col("value"), javaTrimChars).as("line"),
        monotonically_increasing_id().as("_ln")
      )
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

    // skip the header LINE by position, not by textual equality (a data line
    // that happens to equal the header must survive)
    val rows = lines
      .where(col("_ln") > headerLn)
      .select(col("line"), split(col("line"), "\\s+").as("c"), col("_ln"))

    // a ts-less header only fails when a data line is reached — the reference
    // dereferences `cols[colTs]` per DATA line (`FileDataLoader.java:107`),
    // so a header-only file without ts is a valid empty source
    if (tsIdx < 0) {
      if (rows.isEmpty) return emptySeries(spark)
      throw new IllegalArgumentException(s"no ts column in $path")
    }

    val metrics = Seq(
      if (regularIdx >= 0) Some(("regular", regularIdx)) else None,
      if (errorIdx >= 0) Some(("error", errorIdx)) else None
    ).flatten

    // a data line too short for any mapped column is a LOUD failure, like the
    // reference's ArrayIndexOutOfBounds on `cols[colTs]`/`cols[colRegular]`
    // (`FileDataLoader.java:107-113`) — silently emitting null rows would be
    // wrong data; assert_true returns null per good row, so the filter keeps
    // every row while raising on the first malformed one
    val needed = (tsIdx +: metrics.map(_._2)).max + 1
    val checked = rows.where(
      assert_true(
        size(col("c")) >= needed,
        concat(lit(s"malformed TSV line in $name (fewer than $needed columns): "), col("line"))
      ).isNull
    )

    // a header with ts but neither regular nor error* is a valid empty
    // source in the reference (both raw maps just stay empty) — not a crash.
    // Still force the length check: the reference dereferences `cols[colTs]`
    // per data line even when no series column is mapped, so a short line
    // crashes there too
    if (metrics.isEmpty) {
      checked.count()
      return emptySeries(spark)
    }

    // exact-duplicate raw timestamps: the LAST line wins — the reference
    // keys raw rows by the ts STRING (`FileDataLoader.java:107-113`,
    // HashMap.put), so a repeated ts replaces, it does not sum (summing is
    // the DOWNSTREAM bucket behavior for DISTINCT ts in one bucket, O3).
    // The winner is metric-independent, so dedup ONCE before the per-metric
    // projection rather than repeating the window per metric
    val wTs = Window.partitionBy("_ts_raw").orderBy(col("_ln").desc)
    val deduped = checked
      .select(element_at(col("c"), tsIdx + 1).as("_ts_raw"), col("c"), col("_ln"))
      .withColumn("_rn", row_number().over(wTs))
      .where(col("_rn") === 1)
      // a non-numeric ts is a LOUD failure like the reference's
      // Long.parseLong at `AbstractDataLoader.java:134` — and it must stay
      // loud even in a spark.sql.ansi.enabled=false consumer session, where
      // the cast alone would silently yield null buckets
      .withColumn("bucket", col("_ts_raw").cast("long"))
      .where(
        assert_true(
          col("bucket").isNotNull,
          concat(lit(s"non-numeric ts in $name: "), col("_ts_raw"))
        ).isNull
      )

    metrics
      .map { case (metric, idx) =>
        deduped
          .withColumn("value", element_at(col("c"), idx + 1).cast("double"))
          // same for values: the reference's Double.parseDouble crashes on a
          // non-numeric token, never silently nulls it
          .where(
            assert_true(
              col("value").isNotNull,
              concat(lit(s"non-numeric $metric value in $name on ts "), col("_ts_raw"))
            ).isNull
          )
          .select(
            lit(name).as("scope"),
            lit(metric).as("metric"),
            col("bucket"),
            col("value")
          )
      }
      .reduce(_.unionByName(_))
  }

  /** Coerce one JSON node the way gson 2.3.1's `getAsLong` does
    * (`JsonPrimitive.getAsLong` → `LazilyParsedNumber.longValue()`: try
    * `Long.parseLong(raw)`, fall back to `new BigDecimal(raw).longValue()`).
    * So NUMBER tokens never throw — in-range int64 literals stay exact,
    * fractions truncate (1.9 → 1), and out-of-range values (integer or
    * exponent-float) WRAP to their low 64 bits exactly like BigDecimal.
    * String tokens go through Long.parseLong (so "123" passes but "1.5" or
    * "abc" throws → the caller keeps the prefix, the reference's catch-all
    * path), and everything else (null, bool, object, array) throws like
    * gson's JsonNull/primitive getAsLong paths. The caller parses floats
    * with USE_BIG_DECIMAL_FOR_FLOATS so `decimalValue()` IS the exact raw
    * decimal — a double-parsed 1e30 would wrap to DIFFERENT low bits than
    * gson's `BigDecimal("1e30")`.
    */
  private def toLongLikeGson(n: com.fasterxml.jackson.databind.JsonNode): Long =
    if (n.isNumber) {
      if (n.isIntegralNumber && n.canConvertToLong) n.longValue()
      else n.decimalValue().longValue()
    } else if (n.isTextual) java.lang.Long.parseLong(n.asText())
    else throw new IllegalArgumentException(s"not a long: $n")

  /** `.errors` sidecar → expected outlier timestamps (S2). Whole-file parse
    * failures (invalid JSON, non-object root, missing/non-array `errors`)
    * mirror the reference's catch-all → empty; a bad ELEMENT mid-array keeps
    * the prefix already accumulated, exactly like the reference's catch
    * around the add loop (`FileDataLoader.java:25-43` — `list` holds prior
    * adds when `getAsLong` throws). Parsed on the driver with Jackson, not a
    * Spark JSON scan: a sidecar is one tiny config file, and Spark's schema
    * inference coerces mixed-type arrays to double, corrupting int64
    * timestamps above 2^53.
    */
  def readExpectedErrors(spark: SparkSession, tsvPath: String): Seq[Long] = {
    val p = s"$tsvPath.errors"
    if (!isFile(spark, p)) Seq.empty
    else
      Try {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        // exact-decimal floats: toLongLikeGson's wrap semantics need the raw
        // literal's value, not a double approximation (see its scaladoc)
        mapper.configure(
          com.fasterxml.jackson.databind.DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS,
          true
        )
        val root = mapper.readTree(readWholeFile(spark, p))
        val arr = if (root.isObject) root.get("errors") else null
        if (arr == null || !arr.isArray) Seq.empty[Long]
        else
          scala.jdk.CollectionConverters
            .IteratorHasAsScala(arr.elements())
            .asScala
            .map(n => Try(toLongLikeGson(n)))
            .takeWhile(_.isSuccess)
            .map(_.get)
            .toVector
      }.getOrElse(Seq.empty)
  }

  /** `.settings` sidecar → flat string map (S3). Mirrors the reference's
    * entry loop exactly (`FileDataLoader.java:45-64`): values stringify via
    * `getAsString` semantics — for numbers that is the RAW source literal
    * (gson 2.3.1's string-backed `LazilyParsedNumber.toString`, so "1.500"
    * stays "1.500", never a canonical "1.5" re-rendering; Jackson's
    * `asText()` would canonicalize, hence the streaming parser whose
    * `getText` keeps the input spelling) — and the first non-primitive
    * FINAL value (null, nested object, array) stops the loop, keeping the
    * partial map of entries added before it. Duplicate keys behave like
    * gson's LinkedTreeMap: the LAST occurrence's value at the FIRST
    * occurrence's position, which `LinkedHashMap` reproduces. Missing or
    * malformed files are the catch-all → empty map.
    */
  def readSettings(spark: SparkSession, tsvPath: String): Map[String, String] = {
    import com.fasterxml.jackson.core.JsonToken
    val p = s"$tsvPath.settings"
    if (!isFile(spark, p)) Map.empty
    else
      Try {
        val parser = new com.fasterxml.jackson.core.JsonFactory().createParser(readWholeFile(spark, p))
        try {
          require(parser.nextToken() == JsonToken.START_OBJECT, s"settings root is not an object: $p")
          // None = a value getAsString throws on (null/object/array): it
          // stops the reference's loop if still the key's final value
          val entries = scala.collection.mutable.LinkedHashMap.empty[String, Option[String]]
          while (parser.nextToken() != JsonToken.END_OBJECT) {
            val key = parser.currentName()
            val v = parser.nextToken()
            if (v == JsonToken.START_OBJECT || v == JsonToken.START_ARRAY) {
              parser.skipChildren()
              entries(key) = None
            } else if (v == JsonToken.VALUE_NULL) entries(key) = None
            else entries(key) = Some(parser.getText)
          }
          entries.iterator.takeWhile(_._2.isDefined).map { case (k, v) => k -> v.get }.toMap
        } finally parser.close()
      }.getOrElse(Map.empty)
  }
}
