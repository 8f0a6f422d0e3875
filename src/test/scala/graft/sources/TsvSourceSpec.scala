package graft.sources

import graft.kernel.OracleHarness
import graft.model.EngineConfig
import graft.spark.{Detect, SparkTestBase}

/** TSV source parity: the Spark TSV reader must reproduce the test
  * harness's reference-faithful parse on every fixture, and the full
  * TSV → Detect path must match the kernel.
  */
class TsvSourceSpec extends SparkTestBase {

  for (fixture <- Seq("real_test_4.tsv", "real_test_6.tsv", "constant_lines_no_noise_no_errors.tsv")) {
    test(s"tsv source parses like the reference: $fixture") {
      val path = s"${OracleHarness.fixtureDir}/$fixture"
      val mine = TsvSource
        .readSeries(spark, path)
        .collect()
        .map(r => (r.getAs[String]("metric"), r.getAs[Long]("bucket"), r.getAs[Double]("value")))
        .toSet
      val expected = OracleHarness
        .parseTsv(fixture)
        .flatMap { case (metric, pts) => pts.map(p => (metric, p.ts, p.v)) }
        .toSet
      assert(mine == expected)
    }
  }

  /** Write lines to a temp TSV and return its absolute path. */
  private def tmpTsv(lines: String*): String = {
    val dir = java.nio.file.Files.createTempDirectory("tsv_edge")
    dir.toFile.deleteOnExit()
    val f = dir.resolve("edge.tsv")
    java.nio.file.Files.write(f, String.join("\n", lines: _*).getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    f.toString
  }

  private def collectSeries(path: String): Set[(String, Long, Double)] =
    TsvSource
      .readSeries(spark, path)
      .collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[Long]("bucket"), r.getAs[Double]("value")))
      .toSet

  test("header is the first NON-BLANK line and duplicate header tokens are last-wins") {
    // reference maps the header in one overwrite loop (FileDataLoader.java:94-104):
    // last ts -> idx 4, last regular -> idx 2, last error* -> idx 3
    val p = tmpTsv(
      "",
      "   ",
      "regular\tts\tregular\terror_count\tts",
      "9\t1\t10\t0.5\t100",
      "8\t2\t20\t0.7\t200"
    )
    assert(
      collectSeries(p) == Set(
        ("regular", 100L, 10.0),
        ("regular", 200L, 20.0),
        ("error", 100L, 0.5),
        ("error", 200L, 0.7)
      )
    )
  }

  test("duplicate raw timestamps: the LAST line wins (HashMap.put, FileDataLoader.java:107-113)") {
    val p = tmpTsv(
      "ts\tregular\terror",
      "100\t1\t0.1",
      "200\t2\t0.2",
      "200\t3\t0.3"
    )
    assert(
      collectSeries(p) == Set(
        ("regular", 100L, 1.0),
        ("regular", 200L, 3.0),
        ("error", 100L, 0.1),
        ("error", 200L, 0.3)
      )
    )
  }

  test("degenerate files: empty, header-only, and ts-only headers are empty results") {
    assert(collectSeries(tmpTsv("")) == Set.empty)
    assert(collectSeries(tmpTsv("ts\tregular\terror")) == Set.empty)
    // ts but neither regular nor error*: both reference raw maps stay empty
    assert(collectSeries(tmpTsv("ts\tother", "100\t1")) == Set.empty)
    // a ts-LESS header is only an error once a data line is reached — the
    // reference dereferences cols[colTs] per data line, never for the header
    assert(collectSeries(tmpTsv("time\tvalue")) == Set.empty)
    intercept[IllegalArgumentException] {
      collectSeries(tmpTsv("time\tvalue", "1\t2"))
    }
  }

  test("a data line shorter than a mapped column index fails loudly, not with silent null rows") {
    // reference: ArrayIndexOutOfBounds on cols[colRegular] (FileDataLoader.java:107-113)
    val e = intercept[Exception] {
      collectSeries(tmpTsv("ts\tregular", "100\t1", "200"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("malformed TSV line")))
  }

  test("sidecar values keep gson coercion: exact int64 errors, insertion-order settings prefix") {
    val base = tmpTsv("ts\tregular", "100\t1")
    // 2^53+1 must survive exactly (a Spark JSON scan would coerce the mixed
    // array to double and round it); 1.5 truncates like gson getAsLong
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base.errors"),
      """{"errors": [1.5, 9007199254740993]}""".getBytes("UTF-8")
    )
    assert(TsvSource.readExpectedErrors(spark, base) == Seq(1L, 9007199254740993L))
    // the first non-primitive settings value stops the entry loop but keeps
    // the prefix, mirroring the reference's catch around getAsString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base.settings"),
      """{"a": 1, "rollup": null, "z": 2}""".getBytes("UTF-8")
    )
    assert(TsvSource.readSettings(spark, base) == Map("a" -> "1"))
  }

  test("a data line textually equal to the header is DATA, not a skipped repeat header") {
    // the reference treats line 3 as data: cols[colTs]="ts" enters the raw
    // map keyed by the STRING "ts", and load() then crashes on
    // Long.parseLong (`AbstractDataLoader.java:134`) — the parity behavior
    // is a loud failure, never a silent skip that drops the row
    val p = tmpTsv(
      "ts\tregular",
      "100\t1",
      "ts\tregular",
      "200\t2"
    )
    intercept[Exception] {
      collectSeries(p)
    }
    // and a NUMERIC repeat of a data line is kept (positional skip only
    // removes the real header line)
    val p2 = tmpTsv("ts\tregular", "100\t1", "100\t1")
    assert(collectSeries(p2) == Set(("regular", 100L, 1.0)))
  }

  test("non-numeric ts and value tokens stay LOUD even with ANSI mode off") {
    // reference: Long.parseLong / Double.parseDouble crash
    // (AbstractDataLoader.java:134,140); with spark.sql.ansi.enabled=false
    // the casts alone would silently null — the assert_true guards must fire
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val badTs = intercept[Exception] {
        collectSeries(tmpTsv("ts\tregular", "100\t1", "abc\t2"))
      }
      assert(msgs(badTs).exists(_.contains("non-numeric ts")))
      val badVal = intercept[Exception] {
        collectSeries(tmpTsv("ts\tregular", "100\tx"))
      }
      assert(msgs(badVal).exists(_.contains("non-numeric regular value")))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("sources and sidecars work through a qualified file:// URI (Hadoop FS, not java.io)") {
    val base = tmpTsv("ts\tregular", "100\t1")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base.errors"),
      """{"errors": [100]}""".getBytes("UTF-8")
    )
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base.settings"),
      """{"rollup": 300}""".getBytes("UTF-8")
    )
    val uri = s"file://$base"
    assert(collectSeries(uri) == Set(("regular", 100L, 1.0)))
    assert(TsvSource.readExpectedErrors(spark, uri) == Seq(100L))
    assert(TsvSource.readSettings(spark, uri) == Map("rollup" -> "300"))
  }

  test("malformed sidecars: whole-file failure is empty, bad mid-array element keeps the prefix") {
    val base = tmpTsv("ts\tregular", "100\t1")
    // no sidecar files at all
    assert(TsvSource.readExpectedErrors(spark, base) == Seq.empty)
    assert(TsvSource.readSettings(spark, base) == Map.empty)
    // invalid JSON → catch-all empty (FileDataLoader.java:39-42)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base.errors"), "{not json".getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base.settings"), "{not json".getBytes("UTF-8"))
    assert(TsvSource.readExpectedErrors(spark, base) == Seq.empty)
    assert(TsvSource.readSettings(spark, base) == Map.empty)
    // string-typed elements coerce like gson getAsLong; a bad element stops
    // the loop but keeps the prefix already accumulated
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base.errors"),
      """{"errors": [1, "2", "nope", 4]}""".getBytes("UTF-8")
    )
    assert(TsvSource.readExpectedErrors(spark, base) == Seq(1L, 2L))
    // errors key present but not an array → empty
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$base.errors"), """{"errors": 7}""".getBytes("UTF-8"))
    assert(TsvSource.readExpectedErrors(spark, base) == Seq.empty)
  }

  test("sidecar readers: .errors and .settings") {
    val base = s"${OracleHarness.fixtureDir}/real_test_2.tsv"
    assert(TsvSource.readSettings(spark, base) == Map("rollup" -> "300"))
    val errs = TsvSource.readExpectedErrors(spark, s"${OracleHarness.fixtureDir}/constant_line_no_noise_flat_out.tsv")
    assert(errs == Seq(1434880920L, 1434880980L, 1434881040L))
  }

  test("tsv → Detect end-to-end matches kernel validated set") {
    val s = spark
    val fixture = "real_test_4_flatout.tsv"
    val points = Detect.toPoints(TsvSource.readSeries(spark, s"${OracleHarness.fixtureDir}/$fixture"))(s)
    val validated = Detect
      .detectValidated(points, EngineConfig())
      .collect()
      .map(v => v.ts -> v.score)
      .toMap
    val raw = OracleHarness.parseTsv(fixture)
    val processed = graft.kernel.ScopePipeline.process(raw.view.mapValues(_.toIterable).toMap, EngineConfig())
    val flags = graft.kernel.AnalyzerRegistry.all.flatMap(_.analyze(fixture, processed.series.values))
    val expected = graft.kernel.ScopePipeline.score(flags, 1.0)
    assert(validated == expected)
  }
}
