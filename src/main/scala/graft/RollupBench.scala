package graft

/** Optimization-round harness for the HEADLINE path only: calls the frozen
  * Bench.rollupThroughput with the same session config so the rollup+detect
  * pipeline can be profiled and A/B'd without the 46-query loop. Not part of
  * the driver contract.
  *
  * Usage: sbt "runMain graft.RollupBench [turns]"
  */
object RollupBench {
  def main(args: Array[String]): Unit = {
    val turns = if (args.nonEmpty) args(0).toLong else sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "20000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BenchSession.build(cpus)
    val (pps, tiers, sec) = Bench.rollupThroughput(spark, turns, cpus.toInt)
    println(f"[rollup] pps=${pps.toLong} full_sec=$sec%.2f tiers=${tiers.map { case (k, v) => s"$k=$v" }.mkString(",")}")
    spark.stop()
  }
}
