package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (BASELINE.md protocol): run the identical
  * rollup job at a given parallelism, print one JSON line. The sandbox proxy
  * for N→4N executors is local[8] vs local[32] on the 32-core box — invoke
  * twice in separate JVMs (cold sessions) and compute
  * efficiency = (throughput32/throughput8)/4; pass iff ≥ 0.8.
  *
  * Usage: runMain graft.ScalingBench <cores> [turns]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val turns = if (args.length > 1) args(1).toLong else 4000000L
    val (calPreMs, _) = Bench.calibrationProbe()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sampler = new Bench.InWindowSampler().start()
    val (pps, tiers, sec) = Bench.rollupThroughput(spark, turns, cores)
    val samples = sampler.stop()
    // post probe after spark.stop() + GC (ADVICE r6): a live engine heap
    // inflates the post probe and misreads as host contention
    spark.stop()
    System.gc()
    val (calPostMs, _) = Bench.calibrationProbe()
    val tiersJson = tiers.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(
      s"""{"bench":"scaling","cores":$cores,"turns":$turns,"points_per_sec":${pps.toLong},"wall_sec":$sec,"tier_rows":$tiersJson,"calibration_ms":${math
          .max(calPreMs, calPostMs)},"calibration_pre_ms":$calPreMs,"calibration_post_ms":$calPostMs,${Bench.inWindowJson(samples, sampler.bwSamples, sampler.lastHash, sampler.lastBwHash)}}"""
    )
  }
}
