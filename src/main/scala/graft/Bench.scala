package graft

import graft.jobs.FixtureGen
import graft.pipeline.{Derive, SeriesOps}
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark. Emits ONE JSON line:
  * {"metric":...,"value":N,"unit":...,"queries":{...},"sf":...}
  *
  * Headline metric (BASELINE.json): rolled-up points/sec through the
  * raw→1m→1h→1d continuous-aggregate pipeline over a deterministic synthetic
  * transcript corpus (skewed conv sizes; FixtureGen.synthetic). Wall-clock is
  * measured around the actions only (no JVM/Spark startup). Per-query
  * timings over SPARK_GRAFT_SF_DIR are reported in "queries".
  */
object Bench {

  /** Host-contention calibration probe. Times a FIXED single-threaded
    * CPU+memory workload — 4 sequential rotate-xor-multiply hash sweeps over a
    * seeded 256 MB long array (1 GB of reads total) — so a bench draw carries
    * its own evidence of host load: the probe has no Spark, no IO and no
    * parallelism, so any slowdown vs the clean-host reference value in
    * BENCH/BASELINE.md is external contention, not engine regression. Run it
    * BEFORE and AFTER the measured window (contention can start mid-run) and
    * judge on the worse of the two.
    *
    * Returns (elapsedMs, foldedHash). The hash is deterministic for a given
    * seed — emitted into the JSON line so the work cannot be dead-code
    * eliminated and a miscompiled probe is detectable.
    */
  def calibrationProbe(seed: Long = 0x9E3779B97F4A7C15L): (Long, Long) = {
    val n = 32 * 1024 * 1024 // 32 Mi longs = 256 MB
    val a = new Array[Long](n)
    // splitmix64 fill: touches every page before timing starts, so the
    // measured sweeps see no allocation or first-touch page faults
    var x = seed
    var i = 0
    while (i < n) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      a(i) = z ^ (z >>> 31)
      i += 1
    }
    // untimed JIT warm-up of the sweep loop body over a small prefix
    var h = seed
    var j = 0
    while (j < 1024 * 1024) { h = java.lang.Long.rotateLeft(h ^ a(j), 27) * 0x9FB21C651E98DF25L; j += 1 }
    val t0 = System.nanoTime()
    h = seed
    var pass = 0
    while (pass < 4) {
      var k = 0
      while (k < n) { h = java.lang.Long.rotateLeft(h ^ a(k), 27) * 0x9FB21C651E98DF25L; k += 1 }
      pass += 1
    }
    ((System.nanoTime() - t0) / 1000000L, h)
  }

  /** IN-WINDOW contention sampler (round 7). The bracketing pre/post probes
    * cannot see a contention burst that starts AND ends inside the measured
    * window (round 6's driver draw: rollup 10× inflated, both probes clean).
    * This daemon thread runs a small FIXED probe — one rotate-xor-multiply
    * hash sweep over a seeded 16 MB long array — every `periodMs` during the
    * measured window and records, per sample, wall time AND thread-CPU time:
    *
    *  - wall time reflects scheduling pressure. The bench itself saturates
    *    the box, so the clean IN-WINDOW wall band is above the idle-host
    *    probe band (the sampler is thread N+1 of N cores) — the decision
    *    rule therefore compares against the CLEAN IN-WINDOW reference in
    *    BENCH/BASELINE.md, not the idle one. A host burst mid-window shows
    *    up as wall_max (and usually wall_median) far above that band.
    *  - cpu time is the sanity anchor: the sweep's work is fixed, so the
    *    cpu median must sit at the idle reference regardless of load — if
    *    it drifts, the probe itself changed (miscompile/DCE), not the host.
    *
    * The sweep hash is deterministic for a given seed (same anti-DCE
    * witness as calibrationProbe) and emitted in the JSON line. Sampler
    * cost: ~3 ms of one thread every 2 s — noise against a 32-core window.
    *
    * BANDWIDTH probe (round 7, second blind spot): the 16 MB sweep is small
    * enough to ride the shared L3, so an epoch where a neighbor consumes the
    * box's DRAM bandwidth — inflating only the bandwidth-bound rollup scan —
    * can leave wall/cpu above CLEAN (observed: a 4-core leg 25% slow on the
    * rollup stage with every probe clean). Every `bwEvery`-th sample
    * additionally times one sequential fold over a seeded 128 MB long array
    * (far past any cache) and records the observed single-thread read
    * bandwidth in MB/s. Under the bench's own load the observed value is
    * depressed by the bench itself, so the decision rule compares against
    * the clean IN-WINDOW bandwidth reference in BENCH/BASELINE.md, not an
    * idle-host figure. Probe cost: 128 MB per ~10 s ≈ 13 MB/s of one
    * thread — noise against a multi-GB/s window.
    */
  final class InWindowSampler(periodMs: Long = 2000L, seed: Long = 0x9E3779B97F4A7C15L, bwEvery: Int = 5) {
    final case class Sample(offsetMs: Long, wallMicros: Long, cpuMicros: Long)
    final case class BwSample(offsetMs: Long, mbps: Double)

    private val n = 2 * 1024 * 1024 // 2 Mi longs = 16 MB per sweep
    private val a = new Array[Long](n)
    locally { // splitmix64 fill — touches every page before any timed sweep
      var x = seed
      var i = 0
      while (i < n) {
        x += 0x9E3779B97F4A7C15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        a(i) = z ^ (z >>> 31)
        i += 1
      }
    }

    /** one full sweep; deterministic for (seed, n) — the anti-DCE witness */
    def sweepHash: Long = {
      var h = seed
      var k = 0
      while (k < n) { h = java.lang.Long.rotateLeft(h ^ a(k), 27) * 0x9FB21C651E98DF25L; k += 1 }
      h
    }

    private val bwN = 16 * 1024 * 1024 // 16 Mi longs = 128 MB — far past L3
    private val bw = new Array[Long](bwN)
    locally { // same splitmix64 fill, offset seed — pages touched untimed
      var x = seed ^ 0x5851F42D4C957F2DL
      var i = 0
      while (i < bwN) {
        x += 0x9E3779B97F4A7C15L
        var z = x
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        bw(i) = z ^ (z >>> 31)
        i += 1
      }
    }

    /** one sequential xor-fold over the 128 MB array; deterministic — the
      * bandwidth probe's anti-DCE witness (xor keeps the loop load-bound:
      * one fused op per element, the read stream is the cost)
      */
    def bwSweepHash: Long = {
      var h = seed
      var k = 0
      while (k < bwN) { h ^= bw(k) + java.lang.Long.rotateLeft(h, 1); k += 1 }
      h
    }

    @volatile private var running = false
    @volatile private[graft] var lastHash = 0L
    @volatile private[graft] var lastBwHash = 0L
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[Sample]()
    private val bwBuf = new java.util.concurrent.ConcurrentLinkedQueue[BwSample]()
    private val t0 = System.nanoTime()
    private val thread = new Thread(
      () => {
        val mx = java.lang.management.ManagementFactory.getThreadMXBean
        val cpuOk = mx.isCurrentThreadCpuTimeSupported
        lastHash = sweepHash // untimed JIT warm-up before the first sample
        lastBwHash = bwSweepHash
        var tick = 0
        while (running) {
          val w0 = System.nanoTime()
          val c0 = if (cpuOk) mx.getCurrentThreadCpuTime else 0L
          lastHash = sweepHash
          val w1 = System.nanoTime()
          val c1 = if (cpuOk) mx.getCurrentThreadCpuTime else 0L
          buf.add(Sample((w0 - t0) / 1000000L, (w1 - w0) / 1000L, (c1 - c0) / 1000L))
          if (tick % bwEvery == 0) {
            val b0 = System.nanoTime()
            lastBwHash = bwSweepHash
            val b1 = System.nanoTime()
            val mbps = (bwN * 8L).toDouble / 1048576.0 / ((b1 - b0) / 1e9)
            bwBuf.add(BwSample((b0 - t0) / 1000000L, mbps))
          }
          tick += 1
          try Thread.sleep(periodMs)
          catch { case _: InterruptedException => () } // stop() wake-up
        }
      },
      "graft-bench-inwindow-sampler"
    )
    thread.setDaemon(true)

    def start(): this.type = { running = true; thread.start(); this }

    def stop(): Vector[Sample] = {
      running = false
      thread.interrupt()
      thread.join(10000)
      buf.toArray(Array.empty[Sample]).toVector.sortBy(_.offsetMs)
    }

    /** valid after stop() */
    def bwSamples: Vector[BwSample] =
      bwBuf.toArray(Array.empty[BwSample]).toVector.sortBy(_.offsetMs)
  }

  private def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) 0.0
    else {
      val s = xs.sorted
      val mid = s.length / 2
      if (s.length % 2 == 1) s(mid) else (s(mid - 1) + s(mid)) / 2.0
    }

  /** locale-pinned decimal rendering: the f-interpolator formats with the
    * JVM default locale, so a comma-decimal locale (de_DE, fr_FR, …) would
    * emit `4,785` and break every consumer that parses the JSON line
    */
  private def num(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))

  /** the sampler fields of the JSON line, shared by Bench and ScalingBench */
  private[graft] def inWindowJson(
      samples: Vector[InWindowSampler#Sample],
      bwSamples: Vector[InWindowSampler#BwSample],
      hash: Long,
      bwHash: Long
  ): String = {
    val wallMed = median(samples.map(_.wallMicros.toDouble)) / 1000.0
    val wallMax = if (samples.isEmpty) 0.0 else samples.map(_.wallMicros).max / 1000.0
    val cpuMed = median(samples.map(_.cpuMicros.toDouble)) / 1000.0
    val bwMed = median(bwSamples.map(_.mbps))
    val bwMin = if (bwSamples.isEmpty) 0.0 else bwSamples.map(_.mbps).min
    s""""calibration_inwindow_n":${samples.length},"calibration_inwindow_wall_median_ms":${num(wallMed, 3)},"calibration_inwindow_wall_max_ms":${num(wallMax, 3)},"calibration_inwindow_cpu_median_ms":${num(cpuMed, 3)},"calibration_inwindow_hash":"${f"$hash%016x"}","calibration_inwindow_bw_n":${bwSamples.length},"calibration_inwindow_bw_median_mbps":${num(bwMed, 0)},"calibration_inwindow_bw_min_mbps":${num(bwMin, 0)},"calibration_inwindow_bw_hash":"${f"$bwHash%016x"}""""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val turns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "20000000").toLong
    val (calPreMs, calHash) = calibrationProbe()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // in-window sampler covers EVERY measured region (rollup+detect and the
    // per-query loop) — the burst class the bracketing probes cannot see
    val sampler = new InWindowSampler().start()

    // headline: derive + tier ladder over synthetic transcripts
    val (pointsPerSec, tierRows, rollupSec) = rollupThroughput(spark, turns, cpus.toInt)

    // materialize the q24/q25 media fixture OUTSIDE the measured window: it
    // is one-time setup (like the codegen warm-up), not query work, and a
    // version bump would otherwise land the regeneration inside q24's time.
    // NonFatal-guarded: a fixture failure must surface as q24/q25
    // query_errors, never turn the measured run into a failed one
    try SparkEntry.mediaCorpus(spark).count()
    catch { case scala.util.control.NonFatal(e) => System.err.println(s"media fixture warm-up failed: $e") }

    val (results, errors) = timeQueries(spark, sfDir, SparkEntry.queries)
    val samples = sampler.stop()
    // post-window probe AFTER spark.stop() + an explicit GC (ADVICE r6): with
    // the full driver/executor heap still live, bench-induced GC pressure
    // inflates the post probe and the judge-on-worse rule would misattribute
    // engine-JVM pressure to host contention, falsely discarding clean draws
    spark.stop()
    System.gc()
    val (calPostMs, calHash2) = calibrationProbe()
    require(calHash2 == calHash, s"calibration probe non-deterministic: $calHash vs $calHash2")
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + num(v, 3) }
      .mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString(""","query_errors":{""", ",", "}")
    val tiers = tierRows.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // calibration_ms = worse of the pre/post probes: the contended/clean
    // decision rule lives in BENCH/BASELINE.md (clean-host reference value)
    val calJson =
      s""""calibration_ms":${math.max(calPreMs, calPostMs)},"calibration_pre_ms":$calPreMs,"calibration_post_ms":$calPostMs,"calibration_hash":"${f"$calHash%016x"}",${inWindowJson(samples, sampler.bwSamples, sampler.lastHash, sampler.lastBwHash)}"""
    val json =
      s"""{"metric":"rollup_points_per_sec","value":${pointsPerSec.toLong},"unit":"points/sec","queries":$qs$errJson,"sf":"$sfDir","bench_turns":$turns,"tier_rows":$tiers,"rollup_sec":$rollupSec,$calJson}"""
    println(json)
    writeBenchJson(json)
  }

  /** The same line, to a FILE: sbt wraps stdout in [info] noise, so the file
    * is the machine-readable channel (harness runs record "parsed": null
    * from stdout alone). Written atomically (tmp + move) so a reader racing
    * the bench never sees a partial line; any IO failure here must not turn
    * a measured run into a failed one — the stdout line already carries the
    * result, so this logs and returns None instead of throwing.
    */
  def writeBenchJson(
      json: String,
      path: String = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
  ): Option[java.nio.file.Path] =
    try {
      val target = java.nio.file.Paths.get(path).toAbsolutePath
      val tmp = target.resolveSibling(s".${target.getFileName}.tmp")
      java.nio.file.Files.writeString(tmp, json + "\n")
      java.nio.file.Files.move(
        tmp, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING, java.nio.file.StandardCopyOption.ATOMIC_MOVE
      )
      Some(target)
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not write $path: $e")
        None
    }

  /** Time each query's full action. A query that throws must surface as a
    * FAILURE (-1 elapsed + an entry in the error map), not as a plausible
    * elapsed time — a broken query would otherwise read as a FAST one in the
    * bench JSON.
    */
  def timeQueries(
      spark: SparkSession,
      sfDir: String,
      queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame]
  ): (Seq[(String, Double)], collection.Map[String, String]) = {
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        // NonFatal only: an OOM/VM error must ABORT the bench — timing the
        // remaining queries on a corrupted JVM would print inflated-but-
        // plausible values, the exact failure mode this method exists to stop
        try { fn(spark, sfDir).count(); true }
        catch { case scala.util.control.NonFatal(e) => errors(name) = e.getClass.getSimpleName; false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    (results, errors)
  }

  /** Build the synthetic corpus once (written to parquet so the measured job
    * reads real files), then time derive→1m→1h→1d materialization.
    * Returns (points/sec over all tiers produced, per-tier row counts, secs).
    *
    * Workload shape: 2-second turn cadence so the 60s derive genuinely
    * aggregates (~30 turns/bucket — the 100TB path is reduction-heavy, not
    * pass-through). Tier data goes to /dev/shm when available so the
    * single local disk does not serialize the measurement (on a real
    * cluster every executor has its own disks).
    */
  def rollupThroughput(spark: SparkSession, turns: Long, partitions: Int): (Double, Seq[(String, Long)], Double) = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite)
        java.nio.file.Files.createTempDirectory(shm.toPath, "graft_bench").toString
      else java.nio.file.Files.createTempDirectory("graft_bench").toString
    // size the power-law corpus so the ACTUAL turn count ≈ `turns`:
    // Σ_c maxTurns/(1+c)^0.7 ≈ maxTurns · n^0.3/0.3 for n conversations
    val nConvs = math.max(turns / 4000L, 16L)
    val maxTurns = math.max((turns * 0.3 / math.pow(nConvs.toDouble, 0.3)).toLong, 64L)
    FixtureGen
      .synthetic(spark, nConvs, maxTurns = maxTurns, stepSeconds = 2L, partitions = math.max(partitions * 2, 8))
      .write.mode("overwrite").parquet(s"$base/transcripts")
    val actualTurns = spark.read.parquet(s"$base/transcripts").count()

    // warm up codegen/classloading outside the measured window (a cluster
    // job amortizes this once per executor; the 1-JVM proxy pays it once)
    Derive
      .deriveSeries(spark.read.parquet(s"$base/transcripts").limit(100000), 60L, extraMetrics = true)
      .write.mode("overwrite").parquet(s"$base/warmup")

    // measured window: tier WRITES only (counts are bookkeeping, done after)
    val t0 = System.nanoTime()
    val transcripts = spark.read.parquet(s"$base/transcripts")
    val derived = Derive.deriveSeries(transcripts, 60L, extraMetrics = true)
    derived.write.mode("overwrite").parquet(s"$base/tier_raw")
    for ((name, res) <- Seq(("1h", 3600L), ("1d", 86400L))) {
      val prev = spark.read.parquet(s"$base/tier_" + (if (name == "1h") "raw" else "1h"))
      SeriesOps.bucketSum(prev, res).write.mode("overwrite").parquet(s"$base/tier_$name")
    }
    val sec = (System.nanoTime() - t0) / 1e9

    // full-job phase 2 (north_rule: "rollup+detect"): exact 12-analyzer
    // detection over the raw tier's regular/error series
    val tDetect0 = System.nanoTime()
    val points = graft.spark.Detect.toPoints(
      spark.read.parquet(s"$base/tier_raw").where(org.apache.spark.sql.functions.col("metric").isin("regular", "error"))
    )(spark)
    val nValidated = graft.spark.Detect
      .detectValidated(points, graft.model.EngineConfig(resolution = 60L))
      .count()
    val detectSec = (System.nanoTime() - tDetect0) / 1e9

    var counts = Seq(
      "turns" -> actualTurns,
      "raw" -> spark.read.parquet(s"$base/tier_raw").count(),
      "validated" -> nValidated,
      "detect_ms" -> (detectSec * 1000).toLong,
      "rollup_ms" -> (sec * 1000).toLong
    )
    for (name <- Seq("1h", "1d"))
      counts :+= (name -> spark.read.parquet(s"$base/tier_$name").count())
    // headline numerator = tier ROWS only; "validated"/"*_ms" entries are
    // bookkeeping and must not leak into the points count (round-1 bug)
    val tierKeys = Set("raw", "1h", "1d")
    val totalPoints = counts.filter(c => tierKeys(c._1)).map(_._2).sum
    // pps on the rollup window; reported wall is the FULL job (rollup+detect)
    val out = (totalPoints / sec, counts, sec + detectSec)
    // clean up the shm corpus
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(base))
    out
  }
}
