package graft.spark

import graft.model.EngineConfig
import graft.pipeline.SeriesOps
import org.apache.spark.sql.functions._

/** Frozen goldens for the q22/q23 detect outputs on the sf0.001 corpus — the
  * last two driver queries whose CORRECTNESS check is rows-only (the kernel
  * scores are sequential and not SQL-expressible, so DuckDB never pins their
  * VALUES). These literals are the engine's actual output on
  * /root/testdata/sf0.001/events.parquet at resolution 3600, frozen EXACTLY
  * (Double.toString round-trips, so string equality is bit equality): any
  * drift in the pipeline (bucketing, gap fill, train/classify split) or any
  * analyzer kernel fails HERE as a named spec, not just in the 23-fixture
  * differential suite.
  *
  * Regenerate deliberately after an INTENTIONAL semantic change — see
  * README "Frozen goldens" (dump `Detect.detectValidated` /
  * `Detect.detectFlags` over the same pipeline and paste the sorted TSV).
  *
  * Only OneClassSVM emits flags on this corpus/resolution: every other
  * analyzer self-invalidates on these short, erratic hourly series (the
  * reference's validation-error gate, `AbstractAnalyzer.java` semantics) —
  * the goldens pin that gating decision too.
  */
class DetectGoldensSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def points = {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    Detect.toPoints(
      SeriesOps.bucketSum(
        events.select(
          col("event_type").as("scope"),
          lit("value").as("metric"),
          unix_timestamp(col("ts")).as("bucket"),
          col("value")
        ),
        3600L
      )
    )(spark)
  }

  test("q22 detect_validated on sf0.001: exact frozen (scope, ts, score) tuples") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val got = Detect
      .detectValidated(points, EngineConfig(resolution = 3600))
      .collect()
      .sortBy(v => (v.scope, v.ts))
      .map(v => s"${v.scope}\t${v.ts}\t${v.score}")
      .toSeq
    val expected = Seq(
      "signup\t1706634000\t3.0",
      "signup\t1706637600\t3.0"
    )
    assert(got == expected, s"validated output drifted:\n${got.mkString("\n")}")
  }

  test("q23 detect_flags on sf0.001: exact frozen per-flag tuples (all fields)") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(sfDir)))
    val got = Detect
      .detectFlags(points, EngineConfig(resolution = 3600))
      .collect()
      .sortBy(f => (f.scope, f.metric, f.analyzer, f.ts))
      .map(f =>
        s"${f.scope}\t${f.metric}\t${f.analyzer}\t${f.ts}\t${f.value}\t${f.expected}\t${f.lb}\t${f.rb}\t${f.isOutlier}\t${f.outlierScore}\t${f.inlierScore}"
      )
      .toSeq
    val expected =
      """error	value	OneClassSVM	1706598000	12.87	NaN	NaN	NaN	false	3.0	3.0
        |error	value	OneClassSVM	1706601600	0.0	NaN	NaN	NaN	false	3.0	3.0
        |error	value	OneClassSVM	1706605200	76.42	NaN	NaN	NaN	false	3.0	3.0
        |error	value	OneClassSVM	1706608800	39.07	NaN	NaN	NaN	false	3.0	3.0
        |error	value	OneClassSVM	1706612400	0.0	NaN	NaN	NaN	false	3.0	3.0
        |error	value	OneClassSVM	1706616000	9.78	NaN	NaN	NaN	false	3.0	3.0
        |error	value	OneClassSVM	1706619600	0.0	NaN	NaN	NaN	false	3.0	3.0
        |error	value	OneClassSVM	1706623200	0.0	NaN	NaN	NaN	false	3.0	3.0
        |error	value	OneClassSVM	1706626800	0.0	NaN	NaN	NaN	false	3.0	3.0
        |error	value	OneClassSVM	1706630400	20.87	NaN	NaN	NaN	false	3.0	3.0
        |signup	value	OneClassSVM	1706605200	0.0	NaN	NaN	NaN	false	3.0	3.0
        |signup	value	OneClassSVM	1706608800	39.04	NaN	NaN	NaN	false	3.0	3.0
        |signup	value	OneClassSVM	1706612400	65.04	NaN	NaN	NaN	false	3.0	3.0
        |signup	value	OneClassSVM	1706616000	0.0	NaN	NaN	NaN	false	3.0	3.0
        |signup	value	OneClassSVM	1706619600	0.0	NaN	NaN	NaN	false	3.0	3.0
        |signup	value	OneClassSVM	1706623200	14.01	NaN	NaN	NaN	false	3.0	3.0
        |signup	value	OneClassSVM	1706626800	0.0	NaN	NaN	NaN	false	3.0	3.0
        |signup	value	OneClassSVM	1706630400	0.0	NaN	NaN	NaN	false	3.0	3.0
        |signup	value	OneClassSVM	1706634000	4.65	NaN	NaN	NaN	true	3.0	3.0
        |signup	value	OneClassSVM	1706637600	16.87	NaN	NaN	NaN	true	3.0	3.0""".stripMargin.linesIterator.toSeq
    assert(got == expected, s"flags output drifted:\n${got.mkString("\n")}")
    // the two outlier flags here are exactly the two validated ts in q22 —
    // the goldens stay mutually consistent
    val outlierTs = got.filter(_.contains("\ttrue\t")).map(_.split('\t')(3))
    assert(outlierTs == Seq("1706634000", "1706637600"))
  }
}
