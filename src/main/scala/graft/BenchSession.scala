package graft

import org.apache.spark.sql.SparkSession

/** The ONE session builder for the round-8 measurement mains (BenchExtra /
  * RollupBench / PlanDump) — identical config to the frozen driver bench
  * (graft.Bench) so their numbers stay comparable, plus an optional
  * uncompressed event log for stage-level profiling (guide §7.1), enabled
  * by SPARK_GRAFT_EVENTLOG=<dir>. Shared so a future comparability-relevant
  * config lands in one place instead of drifting across three copies.
  */
private[graft] object BenchSession {
  def build(cpus: String): SparkSession = {
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = sys.env.get("SPARK_GRAFT_EVENTLOG").fold(builder) { dir =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      builder
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", dir)
        .config("spark.eventLog.compress", "false")
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
