package graft.kernel

import graft.model.Flag
import nl.us2.timeseriesoutlierdetection._
import scala.jdk.CollectionConverters._

/** Test-time bridge to the prebuilt reference jar (SURVEY.md §5.3): loads a
  * fixture through the real `FileDataLoader`, exposes its processed series and
  * per-analyzer flags for differential comparison against the kernel.
  */
object OracleHarness {

  val fixtureDir = "/root/reference/src/main/resources/testdata"

  /** Temp dir for generated fixtures, removed RECURSIVELY at JVM exit —
    * `File.deleteOnExit` on a non-empty directory silently deletes nothing,
    * so every run would leak its fixtures into /tmp.
    */
  def tempDir(prefix: String): java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.Files
      try
        Files
          .walk(dir)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => Files.deleteIfExists(p))
      catch { case _: java.io.IOException => () }
    }))
    dir
  }

  def fixtureNames: Seq[String] = {
    val d = new java.io.File(fixtureDir)
    d.listFiles().filter(f => f.isFile && f.getName.endsWith(".tsv")).map(_.getName).sorted.toSeq
  }

  final case class OracleRun(loader: AbstractDataLoader, series: Map[String, Timeseries], resolution: Long)

  /** Run the reference load() pipeline on one fixture. */
  def load(fixture: String): OracleRun = loadPath(s"$fixtureDir/$fixture")

  /** Run the reference load() pipeline on an absolute TSV path (generated
    * fixtures live outside [[fixtureDir]]).
    */
  def loadPath(path: String): OracleRun = {
    val dl = new FileDataLoader(path)
    dl.load()
    wrap(dl)
  }

  /** Wrap an already-`load()`ed reference loader of any kind (file or
    * mutable) for differential comparison.
    */
  def wrap(dl: AbstractDataLoader): OracleRun = {
    val f = classOf[AbstractDataLoader].getDeclaredField("timeseries")
    f.setAccessible(true)
    val m = f.get(dl).asInstanceOf[java.util.HashMap[String, Timeseries]].asScala.toMap
    val rf = classOf[AbstractDataLoader].getDeclaredField("targetTsStepResolution")
    rf.setAccessible(true)
    OracleRun(dl, m, rf.getLong(dl))
  }

  /** Run one reference analyzer and normalize its result to kernel Flags. */
  def analyze(run: OracleRun, analyzer: ITimeserieAnalyzer, analyzerName: String, scope: String): Seq[Flag] = {
    val jmap = new java.util.HashMap[String, Timeseries]()
    run.series.foreach { case (k, v) => jmap.put(k, v) }
    val res = analyzer.analyze(run.loader.asInstanceOf[AbstractDataLoader], jmap)
    def conv(o: TimeserieOutlier, isOutlier: Boolean): Flag =
      Flag(scope, o.getSerieName, analyzerName, o.getTs, o.getVal, o.getExpectedVal,
        o.getLeftBound, o.getRightBound, isOutlier, 3.0, 1.0)
    res.getOutliers.asScala.map(conv(_, isOutlier = true)).toSeq ++
      res.getInliers.asScala.map(conv(_, isOutlier = false)).toSeq
  }

  /** kernel analyzer ↔ reference analyzer pairs for differential runs
    * (OneClassSVM excluded: the reference jar has no runnable counterpart
    * offline — see SURVEY §5.3).
    */
  val analyzerPairs: Seq[(KAnalyzer, () => ITimeserieAnalyzer)] = Seq(
    (NoopAnalyzer, () => new NoopTimeserieAnalyzer()),
    (NormalDistributionAnalyzer, () => new NormalDistributionTimeserieAnalyzer()),
    (LogNormalDistributionAnalyzer, () => new LogNormalDistributionTimeserieAnalyzer()),
    (SimpleRegressionAnalyzer, () => new SimpleRegressionTimeserieAnalyzer()),
    (RandomWalkRegressionAnalyzer, () => new RandomWalkRegressionTimeserieAnalyzer()),
    (TimeBucketSimpleRegressionAnalyzer, () => new TimeBucketSimpleRegressionTimeserieAnalyzer()),
    (MovingAverageAnalyzer, () => new MovingAverageTimeserieAnalyzer()),
    (SimpleExponentialSmoothingAnalyzer, () => new SimpleExponentialSmoothingTimeserieAnalyzer()),
    (PolynomialRegressionAnalyzer, () => new PolynomialRegressionTimeserieAnalyzer()),
    (MultipleLinearRegressionAnalyzer, () => new MultipleLinearRegressionTimeserieAnalyzer()),
    (IntervalInterceptorAnalyzer, () => new IntervalInterceptorTimeserieAnalyzer())
  )

  /** Flags canonicalized for exact differential comparison: doubles via
    * their bit pattern so NaN == NaN (the exact-parity contract).
    */
  def canonFlags(fs: Seq[Flag]): Seq[(String, Long, Boolean, Long, Long, Long, Long)] = {
    def b(d: Double) = java.lang.Double.doubleToLongBits(d)
    fs.map(f => (f.metric, f.ts, f.isOutlier, b(f.value), b(f.expected), b(f.lb), b(f.rb)))
      .sortBy(t => (t._1, t._2, t._3.toString, t._4))
  }

  /** Expected-error timestamps from the .errors sidecar, re-bucketed to the
    * fixture's final resolution the same way the reference does
    * (`AbstractDataLoader.java:402-410`).
    */
  def expectedErrors(run: OracleRun): Seq[Long] = {
    val f = classOf[AbstractDataLoader].getDeclaredField("expectedErrors")
    f.setAccessible(true)
    f.get(run.loader).asInstanceOf[java.util.List[java.lang.Long]].asScala.map(_.longValue()).toSeq
  }

  /** Parse a fixture TSV the way `FileDataLoader.loadRawData` does
    * (`FileDataLoader.java:67-120`): trim, skip blanks, split on \s+, header
    * maps ts / regular / startsWith("error"). Raw rows are keyed by the ts
    * STRING (`FileDataLoader.java:107-113`, HashMap.put) so a duplicate
    * timestamp replaces the earlier value rather than accumulating.
    */
  def parseTsv(fixture: String): Map[String, Seq[Pt]] = parseTsvAt(s"$fixtureDir/$fixture")

  def parseTsvAt(path: String): Map[String, Seq[Pt]] = {
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    var colTs = -1
    var colRegular = -1
    var colError = -1
    val regular = scala.collection.mutable.LinkedHashMap.empty[String, Pt]
    val error = scala.collection.mutable.LinkedHashMap.empty[String, Pt]
    var i = 0L
    for (raw <- lines) {
      val line = raw.trim
      if (line.nonEmpty) {
        val cols = line.split("\\s+")
        if (i == 0L) {
          cols.zipWithIndex.foreach { case (c, idx) =>
            if (c == "ts") colTs = idx
            else if (c == "regular") colRegular = idx
            else if (c.startsWith("error")) colError = idx
          }
        } else {
          val tsStr = cols(colTs)
          val ts = tsStr.toLong
          if (colRegular != -1) regular(tsStr) = Pt(ts, cols(colRegular).toDouble)
          if (colError != -1) error(tsStr) = Pt(ts, cols(colError).toDouble)
        }
        i += 1
      }
    }
    Map("regular" -> regular.values.toVector, "error" -> error.values.toVector).filter(_._2.nonEmpty)
  }

  /** Fixture settings sidecar (e.g. {"rollup":300}). */
  def settings(fixture: String): Map[String, String] = settingsAt(s"$fixtureDir/$fixture")

  def settingsAt(path: String): Map[String, String] = {
    val f = new java.io.File(s"$path.settings")
    if (!f.isFile) Map.empty
    else {
      // flat {"k":v} JSON — values numeric or string
      val s = scala.io.Source.fromFile(f).mkString.trim.stripPrefix("{").stripSuffix("}")
      s.split(",").filter(_.contains(":")).map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap
    }
  }
}
