package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1.4): per-query timing with
  * the noop sink so the computation is timed, not the sink, with repetitions
  * and job labels. SEPARATE from the frozen driver bench (graft.Bench) — this
  * main exists so optimization evidence can cite repeated, labeled,
  * noop-isolated numbers without touching the hashed harness.
  *
  * Usage: sbt "runMain graft.BenchExtra [queryNameRegex] [reps]"
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench).
  * Emits one JSON line {"queries_noop_median": {...}, "queries_noop_min": {...}}.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val pattern = if (args.nonEmpty) args(0) else ".*"
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // optional event log for stage-level profiling (guide §7.1)
    val spark = sys.env.get("SPARK_GRAFT_EVENTLOG").fold(builder) { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      builder
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", dir)
        .config("spark.eventLog.compress", "false")
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.mediaCorpus(spark).count()
    catch { case scala.util.control.NonFatal(e) => System.err.println(s"media fixture warm-up failed: $e") }

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val m = s.length / 2
      if (s.length % 2 == 1) s(m) else (s(m - 1) + s(m)) / 2.0
    }
    val medians = scala.collection.mutable.LinkedHashMap[String, Double]()
    val mins = scala.collection.mutable.LinkedHashMap[String, Double]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if name.matches(pattern)) {
      val times = (0 until reps).map { r =>
        spark.sparkContext.setJobDescription(s"$name rep$r")
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case scala.util.control.NonFatal(e) => System.err.println(s"$name: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      medians(name) = med(times)
      mins(name) = times.min
      println(f"[extra] $name%-24s median=${med(times)}%.3f min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    def j(m: collection.Map[String, Double]) =
      m.map { case (k, v) => "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)) }
        .mkString("{", ",", "}")
    println(s"""{"queries_noop_median":${j(medians)},"queries_noop_min":${j(mins)},"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
