package graft.spark

import graft.kernel.{AnalyzerRegistry, KAnalyzer, Pt, ScopePipeline}
import graft.model.{EngineConfig, Flag, Validated}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Exact-parity distributed detection: the kernel's per-scope pipeline
  * (process → 12 analyzers → score) runs per conversation inside
  * `mapPartitions` over scope-clustered, (scope, metric, bucket)-sorted
  * partitions. Parallelism is ACROSS scopes — the 10^12-turn path reduces
  * turns to bounded per-scope series via the distributed Derive/SeriesOps
  * aggregations first, and the auto-rollup ladder bounds per-scope state
  * (SURVEY §7.4-5), guarded by cfg.maxSeriesPoints.
  *
  * Shuffle shape: ONE exchange — repartition(scope) + sortWithinPartitions,
  * then a streaming pass that holds a single scope in memory at a time
  * (no groupByKey object hashing, no second exchange). When the input is
  * already scope-clustered (e.g. straight off a repartition(scope) derive),
  * pass assumeClustered = true and the repartition is skipped entirely.
  *
  * FP note (SURVEY §4.3): every gate/bound is computed inside the sorted
  * per-scope kernel, so results are independent of partitioning and
  * bit-identical to the single-threaded kernel.
  */
object Detect {

  final case class SeriesPoint(scope: String, metric: String, bucket: Long, value: Double)

  /** consecutive-run grouping over a scope-sorted iterator — one scope
    * buffered at a time.
    */
  private def scopeRuns(it: Iterator[SeriesPoint]): Iterator[(String, Array[SeriesPoint])] =
    new Iterator[(String, Array[SeriesPoint])] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): (String, Array[SeriesPoint]) = {
        val scope = buf.head.scope
        val arr = scala.collection.mutable.ArrayBuffer.empty[SeriesPoint]
        while (buf.hasNext && buf.head.scope == scope) arr += buf.next()
        (scope, arr.toArray)
      }
    }

  private def clustered(points: Dataset[SeriesPoint], assumeClustered: Boolean): Dataset[SeriesPoint] = {
    val spark = points.sparkSession
    import spark.implicits._
    // EXPLICIT partition count (disables AQE coalescing for this exchange):
    // the kernel stage's cost is per-point CPU, not bytes, so AQE's
    // byte-based coalescing shrinks it below the core count — measured 11
    // tasks of ~2.3 s each on 32 cores at bench scale (uniform, not skewed:
    // pure lost parallelism). Scale-adaptive: the max of the session's
    // shuffle partitions and defaultParallelism, never a local constant —
    // on a real cluster this keeps whichever is higher.
    val parts = math.max(spark.sparkContext.defaultParallelism, spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val df = if (assumeClustered) points.toDF() else points.toDF().repartition(parts, col("scope"))
    df.sortWithinPartitions("scope", "metric", "bucket").as[SeriesPoint]
  }

  def detectFlags(
      points: Dataset[SeriesPoint],
      cfg: EngineConfig,
      analyzers: Seq[KAnalyzer] = AnalyzerRegistry.all,
      assumeClustered: Boolean = false
  ): Dataset[Flag] = {
    val spark = points.sparkSession
    import spark.implicits._
    clustered(points, assumeClustered).mapPartitions { it =>
      scopeRuns(it).flatMap { case (scope, pts) =>
        val processed = processGroup(scope, pts, cfg)
        analyzers.iterator.flatMap(_.analyze(scope, processed.series.values))
      }
    }
  }

  /** Full per-scope run: pipeline + analyzers + V3 scoring → validated
    * outliers with the reference-shaped details JSON
    * (`AbstractDataLoader.java:334-368`): `outliers` = every outlier record
    * in the scope (the reference attaches the SAME full list to each
    * validated ts, field names per `TimeserieOutlier.getJsonObjectWithDetails`,
    * `TimeserieOutlier.java:74-85`) and `timeseries` = the last-10-point
    * snapshot of every processed series (values ascending by ts).
    */
  def detectValidated(
      points: Dataset[SeriesPoint],
      cfg: EngineConfig,
      analyzers: Seq[KAnalyzer] = AnalyzerRegistry.all,
      assumeClustered: Boolean = false
  ): Dataset[Validated] = {
    val spark = points.sparkSession
    import spark.implicits._
    clustered(points, assumeClustered).mapPartitions { it =>
      scopeRuns(it).flatMap { case (scope, pts) =>
        val processed = processGroup(scope, pts, cfg)
        val flags = analyzers.flatMap(_.analyze(scope, processed.series.values))
        validatedForScope(scope, flags, processed, cfg.minScore)
      }
    }
  }

  /** V3 scoring + reference-shaped details JSON for ONE scope — shared by
    * the batch path above and `streaming.StreamingDetect`, so a user moving
    * between them sees the identical payload.
    */
  private[graft] def validatedForScope(
      scope: String,
      flags: Seq[Flag],
      processed: ScopePipeline.Processed,
      minScore: Double
  ): Iterator[Validated] = {
    val scores = ScopePipeline.score(flags, minScore)
    if (scores.isEmpty) return Iterator.empty
    val (outliers, snaps) = ScopePipeline.detailsPayload(flags, processed.series)
    val outlierJson = outliers
      .map { o =>
        s"""{"serie_name":${js(o.serieName)},"timestamp":${o.timestamp},"analyzer_name":${js(o.analyzerName)},""" +
          s""""measured_value":${jd(o.measuredValue)},"expected_value":${jd(o.expectedValue)},""" +
          s""""expected_value_left_bound":${jd(o.leftBound)},"expected_value_right_bound":${jd(o.rightBound)},""" +
          s""""outlier_magnitude":${jd(o.magnitude)}}"""
      }
      .mkString("[", ",", "]")
    val snapshotJson = snaps
      .map { case (name, vs) => s"""${js(name)}:${vs.map(jd).mkString("[", ",", "]")}""" }
      .mkString("{", ",", "}")
    val details = s"""{"outliers":$outlierJson,"timeseries":$snapshotJson}"""
    scores.toSeq.sortBy(_._1).iterator.map { case (ts, score) =>
      Validated(scope, ts, score, details)
    }
  }

  /** O13 + V3 expected-errors check, exact path
    * (`AbstractDataLoader.java:402-410` re-bucket + dedupe at the FINAL
    * per-scope resolution — which the auto-rollup ladder may have coarsened —
    * and `:313-320` found/not-found): per expected (scope, ts) report the
    * number of outlier records at that bucket, the net V3 score (ungated),
    * and found = matches ≥ 1. Expected timestamps ride along with the scope's
    * points (broadcast-joined by the caller or passed as a map), so the check
    * runs inside the same single-exchange per-scope pass as detection.
    */
  final case class ExpectedCheck(scope: String, ts: Long, matches: Long, score: Double, found: Boolean)

  def checkExpectedErrors(
      points: Dataset[SeriesPoint],
      expected: Map[String, Seq[Long]],
      cfg: EngineConfig,
      analyzers: Seq[KAnalyzer] = AnalyzerRegistry.all,
      assumeClustered: Boolean = false
  ): Dataset[ExpectedCheck] = {
    val spark = points.sparkSession
    import spark.implicits._
    val expectedB = spark.sparkContext.broadcast(expected)
    clustered(points, assumeClustered).mapPartitions { it =>
      scopeRuns(it).flatMap { case (scope, pts) =>
        expectedB.value.get(scope) match {
          case None | Some(Seq()) => Iterator.empty
          case Some(raw) =>
            val processed = processGroup(scope, pts, cfg)
            val flags = analyzers.flatMap(_.analyze(scope, processed.series.values))
            ScopePipeline.expectedReport(flags, raw, processed.resolution).iterator.map {
              case (ts, matches, score, found) => ExpectedCheck(scope, ts, matches, score, found)
            }
        }
      }
    }
  }

  private def jd(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" else d.toString

  /** JSON string literal — serie/analyzer names come from user data and are
    * not guaranteed quote/control-char free (the reference's gson escapes).
    */
  private def js(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  private def processGroup(
      scope: String,
      arr: Array[SeriesPoint],
      cfg: EngineConfig
  ): ScopePipeline.Processed = {
    require(
      arr.length <= cfg.maxSeriesPoints,
      s"scope $scope has ${arr.length} points, exceeding maxSeriesPoints=${cfg.maxSeriesPoints}; " +
        "roll up to a coarser tier before detection"
    )
    val raw: Map[String, Iterable[Pt]] =
      arr.groupBy(_.metric).map { case (m, ps) => m -> ps.map(p => Pt(p.bucket, p.value)).toIndexedSeq }
    ScopePipeline.process(raw, cfg)
  }

  /** Convenience: long-row DataFrame → typed points. */
  def toPoints(df: org.apache.spark.sql.DataFrame)(implicit spark: SparkSession): Dataset[SeriesPoint] = {
    import spark.implicits._
    df.select("scope", "metric", "bucket", "value").as[SeriesPoint]
  }
}
