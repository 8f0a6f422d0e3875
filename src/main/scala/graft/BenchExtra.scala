package graft

/** Optimization-round measurement harness (guide §1.4): per-query timing with
  * the noop sink so the computation is timed, not the sink, with repetitions
  * and job labels. SEPARATE from the frozen driver bench (graft.Bench) — this
  * main exists so optimization evidence can cite repeated, labeled,
  * noop-isolated numbers without touching the hashed harness.
  *
  * Usage: sbt "runMain graft.BenchExtra [queryNameRegex] [reps]"
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench),
  * SPARK_GRAFT_EVENTLOG (optional profiling, see BenchSession).
  * Emits one JSON line {"queries_noop_median": {...}, "queries_noop_min": {...},
  * "query_errors": {...}}. A failed rep records -1.0 — never its partial
  * elapsed time, which would read as a speedup — and poisons that query's
  * median/min to -1.0 so broken queries are unmistakable in the artifact.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val pattern = if (args.nonEmpty) args(0) else ".*"
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BenchSession.build(cpus)
    try SparkEntry.mediaCorpus(spark).count()
    catch { case scala.util.control.NonFatal(e) => System.err.println(s"media fixture warm-up failed: $e") }

    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val m = s.length / 2
      if (s.length % 2 == 1) s(m) else (s(m - 1) + s(m)) / 2.0
    }
    val medians = scala.collection.mutable.LinkedHashMap[String, Double]()
    val mins = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if name.matches(pattern)) {
      val times = (0 until reps).map { r =>
        spark.sparkContext.setJobDescription(s"$name rep$r")
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); (System.nanoTime() - t0) / 1e9 }
        catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"$name: $e")
            errors(name) = e.getClass.getSimpleName
            -1.0
        }
      }
      spark.sparkContext.setJobDescription(null)
      // any failed rep marks the whole query failed (-1) — a partial time
      // in the medians would masquerade as a speedup
      val ok = !times.contains(-1.0)
      medians(name) = if (ok) med(times) else -1.0
      mins(name) = if (ok) times.min else -1.0
      println(f"[extra] $name%-24s median=${medians(name)}%.3f min=${mins(name)}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    def j(m: collection.Map[String, Double]) =
      m.map { case (k, v) => "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)) }
        .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    println(
      s"""{"queries_noop_median":${j(medians)},"queries_noop_min":${j(mins)},"query_errors":$errJson,"sf":"$sfDir","reps":$reps}"""
    )
    spark.stop()
  }
}
