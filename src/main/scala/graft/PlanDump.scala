package graft

/** Optimization-round tooling (guide §7.2): dump `.explain("formatted")` for
  * every declared query to a directory, so plan claims in OPTIMIZATION_r*.md
  * are checkable without running Spark, plus per-phase planning times
  * (QueryPlanningTracker). NOT part of the driver bench contract —
  * Bench.scala stays the sole timed harness.
  *
  * Usage: sbt "runMain graft.PlanDump <outDir> [queryNameRegex]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r08"
    val pattern = if (args.length > 1) args(1) else ".*"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BenchSession.build(cpus)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // the media fixture must exist (same untimed warm-up Bench does)
    try SparkEntry.mediaCorpus(spark).count()
    catch { case scala.util.control.NonFatal(e) => System.err.println(s"media fixture warm-up failed: $e") }
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if name.matches(pattern)) {
      try {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis + optimization + physical planning
        val tPlan = (System.nanoTime() - t1) / 1e9
        val phases = df.queryExecution.tracker.phases
          .map { case (k, v) => f"$k=${(v.endTimeMs - v.startTimeMs) / 1000.0}%.2fs" }
          .mkString(" ")
        println(f"[plan] $name%-24s build=$tBuild%.2fs plan=$tPlan%.2fs $phases")
        val txt = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(java.nio.file.Paths.get(outDir, s"$name.txt"), txt)
        println(s"wrote $outDir/$name.txt")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"$name: FAILED to plan: $e")
      }
    }
    spark.stop()
  }
}
