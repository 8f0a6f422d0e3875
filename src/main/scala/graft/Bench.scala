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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val turns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "2000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // headline: derive + tier ladder over synthetic transcripts
    val (pointsPerSec, tierRows, rollupSec) = rollupThroughput(spark, turns, cpus.toInt)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val tiers = tierRows.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(
      s"""{"metric":"rollup_points_per_sec","value":${pointsPerSec.toLong},"unit":"points/sec","queries":$qs,"sf":"$sfDir","bench_turns":$turns,"tier_rows":$tiers,"rollup_sec":$rollupSec}"""
    )
    spark.stop()
  }

  /** Build the synthetic corpus once (written to parquet so the measured job
    * reads real files), then time derive→1m→1h→1d materialization.
    * Returns (points/sec over all tiers produced, per-tier row counts, secs).
    */
  def rollupThroughput(spark: SparkSession, turns: Long, partitions: Int): (Double, Seq[(String, Long)], Double) = {
    val base = java.nio.file.Files.createTempDirectory("graft_bench").toString
    val nConvs = math.max(turns / 2000L, 16L)
    FixtureGen
      .synthetic(spark, nConvs, maxTurns = turns / 8, partitions = math.max(partitions * 2, 8))
      .write.mode("overwrite").parquet(s"$base/transcripts")

    val t0 = System.nanoTime()
    val transcripts = spark.read.parquet(s"$base/transcripts")
    val derived = Derive.deriveSeries(transcripts, 60L, extraMetrics = true)
    derived.write.mode("overwrite").parquet(s"$base/tier_raw")
    val raw = spark.read.parquet(s"$base/tier_raw")
    var counts = Seq("raw" -> raw.count())
    for ((name, res, df) <- SeriesOps.tiers(raw)) {
      df.write.mode("overwrite").parquet(s"$base/tier_$name")
      counts :+= (name -> spark.read.parquet(s"$base/tier_$name").count())
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val totalPoints = counts.map(_._2).sum
    (totalPoints / sec, counts, sec)
  }
}
