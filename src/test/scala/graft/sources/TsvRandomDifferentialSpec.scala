package graft.sources

import graft.spark.SparkTestBase
import nl.us2.timeseriesoutlierdetection.FileDataLoader
import scala.jdk.CollectionConverters._
import scala.util.Random

/** Seeded randomized differential for the TSV loader: adversarial files
  * (duplicate timestamps, duplicate header tokens, junk columns, blank and
  * whitespace-only lines, mixed tab/space separators, zero-padded ts
  * aliases, trailing extra cells) are parsed by BOTH the reference's actual
  * `FileDataLoader.loadRawData()` (`FileDataLoader.java:67-120`, running
  * from the prebuilt jar) and [[TsvSource.readSeries]], and the resulting
  * point multisets must be identical. The hand-written edge cases in
  * [[TsvSourceSpec]] pin individual semantics; this sweeps their
  * combinations under one fixed seed, so a drift in any one rule fails
  * deterministically.
  *
  * The raw stage stores STRINGS (`series.put(tsStr, cols[col])`) — the
  * reference parses only the dedup winners later, in
  * `AbstractDataLoader.processData` (`AbstractDataLoader.java:123-141`).
  * The expected points below therefore parse the raw map's entries exactly
  * the way `processData` does (`Long.parseLong` / `Double.parseDouble`),
  * which is also why [[TsvSource]]'s loud non-numeric guards sit AFTER its
  * last-wins dedup: a malformed token on a losing duplicate line is
  * discarded unparsed by both engines.
  */
class TsvRandomDifferentialSpec extends SparkTestBase {

  private val junkPool = Vector("foo", "bar", "count", "value", "err", "ts2")
  private val errorNamePool = Vector("error", "errors", "error_rate", "errorX")
  private val separatorPool = Vector("\t", " ", "  ", "\t\t", " \t")

  private def numericCell(rnd: Random): String = rnd.nextInt(3) match {
    case 0 => rnd.nextInt(1000).toString
    case 1 => (rnd.nextDouble() * 100).toString
    // Locale.ROOT: a comma-decimal default locale would render "15,000",
    // failing Double.parseDouble for reasons unrelated to engine parity
    case _ => "%.3f".formatLocal(java.util.Locale.ROOT, rnd.nextDouble() * 1000)
  }

  /** One random fixture: returns the lines of the file. */
  private def generate(rnd: Random): Seq[String] = {
    // header: ts always present; regular/error* usually; junk and duplicate
    // tokens sometimes (duplicates exercise the last-wins header mapping)
    val tokens = scala.collection.mutable.ArrayBuffer("ts")
    if (rnd.nextDouble() < 0.85) tokens += "regular"
    if (rnd.nextDouble() < 0.65) tokens += errorNamePool(rnd.nextInt(errorNamePool.size))
    for (_ <- 0 until rnd.nextInt(4)) tokens += junkPool(rnd.nextInt(junkPool.size))
    if (rnd.nextDouble() < 0.25) tokens += tokens(rnd.nextInt(tokens.size))
    val header = rnd.shuffle(tokens.toVector)
    val tsIdx = header.lastIndexOf("ts")

    // ts pool small enough to force duplicate-timestamp lines; sometimes a
    // zero-padded alias of an existing ts (distinct STRING key, same long)
    // and sometimes a negative ts
    val poolSize = 1 + rnd.nextInt(8)
    val pool = scala.collection.mutable.ArrayBuffer.tabulate(poolSize) { _ =>
      (1400000000L + rnd.nextInt(10000)).toString
    }
    if (rnd.nextDouble() < 0.3) pool += ("0" + pool(0))
    if (rnd.nextDouble() < 0.15) pool += ("-" + (1 + rnd.nextInt(1000)))

    val dataLines = Vector.tabulate(rnd.nextInt(31)) { _ =>
      val cells = header.indices.map { i =>
        if (i == tsIdx) pool(rnd.nextInt(pool.size)) else numericCell(rnd)
      } ++ (if (rnd.nextDouble() < 0.15) Seq(numericCell(rnd)) else Seq.empty)
      cells.mkString(separatorPool(rnd.nextInt(separatorPool.size)))
    }

    val blankish = Vector("", "   ", "\t")
    val pre =
      if (rnd.nextDouble() < 0.4) Vector.fill(1 + rnd.nextInt(2))(blankish(rnd.nextInt(blankish.size)))
      else Vector.empty
    val body = dataLines.flatMap { l =>
      if (rnd.nextDouble() < 0.12) Vector(blankish(rnd.nextInt(blankish.size)), l) else Vector(l)
    }
    pre ++ Vector(header.mkString(separatorPool(rnd.nextInt(separatorPool.size)))) ++ body
  }

  private def write(dir: java.nio.file.Path, name: String, lines: Seq[String]): String = {
    val f = dir.resolve(name)
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  /** Parse the reference raw map's winners exactly like `processData`. */
  private def referencePoints(path: String): Vector[(String, Long, Double)] = {
    val raw = new FileDataLoader(path).loadRawData()
    raw.asScala.toVector.flatMap { case (metric, m) =>
      m.asScala.toVector.map { case (tsStr, vStr) =>
        (metric, java.lang.Long.parseLong(tsStr), java.lang.Double.parseDouble(vStr))
      }
    }
  }

  private def minePoints(path: String): Vector[(String, Long, Double)] =
    TsvSource
      .readSeries(spark, path)
      .collect()
      .toVector
      .map(r => (r.getAs[String]("metric"), r.getAs[Long]("bucket"), r.getAs[Double]("value")))

  // sweep width: same knob as the kernel/mutable differentials; the rnd
  // sequence is drawn serially, so a wide run extends (never reshuffles)
  // the default fixtures
  private val N = math.max(18, sys.props.getOrElse("graft.randFixtures", "18").toInt)

  test("randomized differential: N seeded adversarial TSVs parse identically to FileDataLoader.loadRawData") {
    val rnd = new Random(20260817L)
    val dir = graft.kernel.OracleHarness.tempDir("tsv_rand_diff")
    var nonTrivial = 0
    for (i <- 0 until N) {
      val lines = generate(rnd)
      val path = write(dir, s"rand_$i.tsv", lines)
      val expected = referencePoints(path).sorted
      val mine = minePoints(path).sorted
      assert(mine == expected, s"fixture rand_$i diverged:\n${lines.mkString("\n")}")
      if (expected.nonEmpty) nonTrivial += 1
    }
    // the sweep must actually exercise data, not 18 empty-series files
    assert(nonTrivial >= 12, s"generator produced only $nonTrivial non-empty fixtures")
  }

  test("scope column is the file basename on a generated fixture") {
    val rnd = new Random(7L)
    val dir = graft.kernel.OracleHarness.tempDir("tsv_rand_scope")
    // regenerate until a fixture that actually PARSES TO POINTS appears
    // (seeded => stable); an if-guard here would let the assertion go
    // silently vacuous on an empty-series draw
    val path = Iterator
      .from(0)
      .map(k => write(dir, s"scoped_$k.tsv", generate(rnd)))
      .find(p => referencePoints(p).nonEmpty)
      .get
    val scopes = TsvSource.readSeries(spark, path).select("scope").distinct().collect().map(_.getString(0))
    assert(scopes.toSeq == Seq(path.split("/").last))
  }

  // ---- throw-parity: files the reference crashes on must crash here too ----

  private def tmp(name: String, lines: String*): String = {
    val dir = graft.kernel.OracleHarness.tempDir("tsv_throw")
    write(dir, name, lines)
  }

  test("short data line: both engines throw (reference AIOOBE at cols[col], ours assert_true)") {
    val p = tmp("short.tsv", "ts\tregular", "100\t1.5", "200")
    intercept[ArrayIndexOutOfBoundsException] { new FileDataLoader(p).loadRawData() }
    val e = intercept[Exception] { minePoints(p) }
    assert(e.getMessage != null || e.getCause != null) // Spark wraps the RuntimeException
  }

  test("non-numeric ts on a WINNER line: reference load() and readSeries both throw") {
    val p = tmp("badts.tsv", "ts\tregular", "100\t1.5", "abc\t2.5")
    intercept[NumberFormatException] { new FileDataLoader(p).load() }
    intercept[Exception] { minePoints(p) }
    // control: same file with the token fixed parses cleanly on both sides
    val ok = tmp("goodts.tsv", "ts\tregular", "100\t1.5", "101\t2.5")
    assert(minePoints(ok).sorted == referencePoints(ok).sorted)
  }

  test("non-numeric value on a WINNER line: reference load() and readSeries both throw") {
    val p = tmp("badval.tsv", "ts\tregular", "100\t1.5", "200\toops")
    intercept[NumberFormatException] { new FileDataLoader(p).load() }
    intercept[Exception] { minePoints(p) }
  }

  test("non-numeric value on a LOSING duplicate line is discarded unparsed by both engines") {
    // ts 100 appears twice; the malformed first value is overwritten by the
    // raw map put before the reference ever parses it
    val p = tmp("loser.tsv", "ts\tregular", "100\toops", "100\t2.5", "200\t3.5")
    assert(referencePoints(p).sorted == Vector(("regular", 100L, 2.5), ("regular", 200L, 3.5)))
    assert(minePoints(p).sorted == referencePoints(p).sorted)
  }

  test("ts-less header with data rows: both engines throw") {
    val p = tmp("nots.tsv", "regular\tfoo", "1.5\t2")
    intercept[ArrayIndexOutOfBoundsException] { new FileDataLoader(p).loadRawData() }
    intercept[IllegalArgumentException] { minePoints(p) }
  }

  // ---- randomized sidecar differential (vs the reference's actual
  // loadExpectedErrors/loadSettings, running over the clean-room gson stub
  // that is the adjudicated test oracle) ----

  /** Render one random JSON value as a literal; `depth` bounds nesting. */
  private def jsonValue(rnd: Random, depth: Int): String = {
    val words = Vector("abc", "x y", "none", "42", "1.5", "log10", "linear")
    rnd.nextInt(if (depth > 0) 11 else 9) match {
      case 0 => (1400000000L + rnd.nextInt(100000)).toString
      // Locale.ROOT (comma-decimal locales); %g keeps trailing zeros
      // ("1.500"), a NON-canonical spelling settings must preserve raw
      case 1 => "%.4g".formatLocal(java.util.Locale.ROOT, rnd.nextDouble() * 100)
      case 2 => "\"" + (1 + rnd.nextInt(100000)).toString + "\"" // numeric string
      case 3 => "\"" + words(rnd.nextInt(words.size)) + "\""
      case 4 => if (rnd.nextBoolean()) "true" else "false"
      case 5 => "null"
      case 6 => (rnd.nextDouble() * 10).toString
      // out-of-Long-range integer: getAsLong wraps to the low 64 bits
      case 7 => (BigInt(Long.MaxValue) + 1 + rnd.nextInt(1000000)).toString
      // huge exponent float: wraps via the exact-decimal value, and its raw
      // spelling ("10e27") must survive the settings getAsString path
      case 8 => s"1${"0" * rnd.nextInt(3)}e${25 + rnd.nextInt(10)}"
      case 9 => s"[${jsonValue(rnd, depth - 1)}]"
      case _ => s"""{"k":${jsonValue(rnd, depth - 1)}}"""
    }
  }

  private def randomErrorsJson(rnd: Random): String = rnd.nextInt(10) match {
    case 0       => "[1,2]" // root not an object
    case 1       => """{"x":1}""" // no errors key
    case 2       => """{"errors":5}""" // errors not an array
    case 3       => """{"errors":[1,""" // malformed
    case _       => "{\"errors\":[" + Vector.fill(rnd.nextInt(9))(jsonValue(rnd, 1)).mkString(",") + "]}"
  }

  private def randomSettingsJson(rnd: Random): String = rnd.nextInt(10) match {
    case 0 => "[1]" // root not an object
    case 1 => """{"rollup":""" // malformed
    case _ =>
      val keyPool = Vector("rollup", "forecast_periods", "min_score", "gap_fill", "a", "b", "a")
      "{" + Vector
        .fill(rnd.nextInt(7)) {
          "\"" + keyPool(rnd.nextInt(keyPool.size)) + "\":" + jsonValue(rnd, 1)
        }
        .mkString(",") + "}"
  }

  test("randomized sidecar differential: 40 seeded .errors and .settings files read identically") {
    val rnd = new Random(424242L)
    val dir = graft.kernel.OracleHarness.tempDir("tsv_rand_sidecar")
    var nonEmptyErr = 0
    var nonEmptySet = 0
    for (i <- 0 until 40) {
      val base = dir.resolve(s"side_$i.tsv").toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(base + ".errors"),
        randomErrorsJson(rnd).getBytes("UTF-8")
      )
      java.nio.file.Files.write(
        java.nio.file.Paths.get(base + ".settings"),
        randomSettingsJson(rnd).getBytes("UTF-8")
      )
      val ref = new FileDataLoader(base)
      val refErrors = ref.loadExpectedErrors().asScala.map(_.longValue()).toSeq
      val refSettings = ref.loadSettings().asScala.toMap
      val myErrors = TsvSource.readExpectedErrors(spark, base)
      val mySettings = TsvSource.readSettings(spark, base)
      def content(suffix: String) =
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(base + suffix)), "UTF-8")
      assert(myErrors == refErrors, s"errors diverged on side_$i: ${content(".errors")}")
      assert(mySettings == refSettings, s"settings diverged on side_$i: ${content(".settings")}")
      if (refErrors.nonEmpty) nonEmptyErr += 1
      if (refSettings.nonEmpty) nonEmptySet += 1
    }
    assert(nonEmptyErr >= 10 && nonEmptySet >= 10, s"generator too degenerate: $nonEmptyErr/$nonEmptySet")
  }

  test("out-of-range .errors numbers WRAP to their low 64 bits like gson, never throw or saturate") {
    // gson 2.3.1 stores every parsed number as a string-backed
    // LazilyParsedNumber whose longValue() tries Long.parseLong and falls
    // back to new BigDecimal(raw).longValue() — dropping the fraction and
    // keeping only the low-order 64 bits, NEVER throwing. So the reference
    // reads the FULL list with wrapped values: no prefix-keeping (a
    // previous build threw here) and no Long.MAX_VALUE saturation (what
    // Jackson's double path would do for 1e30).
    val dir = graft.kernel.OracleHarness.tempDir("tsv_bigint")
    val base = dir.resolve("big.tsv").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base + ".errors"),
      """{"errors":[7, 99999999999999999999999999, 9, 1e30, 1.9, -1.9]}""".getBytes("UTF-8")
    )
    val expected = Seq(
      7L,
      BigInt("99999999999999999999999999").toLong, // low 64 bits
      9L,
      BigDecimal("1e30").toBigInt.toLong, // exact-decimal wrap, NOT (long) 1.0e30
      1L, // fraction drops toward zero
      -1L
    )
    assert(TsvSource.readExpectedErrors(spark, base) == expected)
    // the reference (over the lazily-parsed stub oracle) agrees
    assert(new FileDataLoader(base).loadExpectedErrors().asScala.map(_.longValue()).toSeq == expected)
  }

  test("settings keep the RAW number spelling like gson getAsString, not a canonical re-rendering") {
    val dir = graft.kernel.OracleHarness.tempDir("tsv_rawset")
    val base = dir.resolve("raw.tsv").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(base + ".settings"),
      """{"a":1.500, "b":1e3, "c":42, "d":"x"}""".getBytes("UTF-8")
    )
    val expected = Map("a" -> "1.500", "b" -> "1e3", "c" -> "42", "d" -> "x")
    assert(TsvSource.readSettings(spark, base) == expected)
    assert(new FileDataLoader(base).loadSettings().asScala.toMap == expected)
  }
}
