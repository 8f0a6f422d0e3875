package graft

import graft.spark.SparkTestBase
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench's failure-visibility contract: a throwing query reports -1 and
  * an error entry, never a plausible elapsed time; healthy queries report a
  * positive elapsed time and no error entry.
  */
class BenchSpec extends SparkTestBase {

  test("timeQueries: a throwing query surfaces as -1 + error, not as a fast time") {
    val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_query" -> ((s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("v") }),
      "broken_query" -> ((_, _) => throw new IllegalStateException("boom"))
    )
    val (results, errors) = Bench.timeQueries(spark, "/nonexistent", queries)
    val byName = results.toMap
    assert(byName("ok_query") > 0.0, s"healthy query must report elapsed time: $byName")
    assert(byName("broken_query") == -1.0, s"broken query must report -1: $byName")
    assert(errors == Map("broken_query" -> "IllegalStateException"), s"got $errors")
    // deterministic ordering (sorted by name) so bench JSON diffs cleanly
    assert(results.map(_._1) == results.map(_._1).sorted)
  }

  test("calibrationProbe: deterministic hash (pinned) and a measured, non-zero window") {
    // the pinned hash is the anti-DCE witness: if the JIT ever elides the
    // sweep (or the mix constants drift), calibration_ms stops measuring the
    // documented workload and the clean-host reference in BENCH/BASELINE.md
    // becomes meaningless — this catches that as a named failure
    val (ms, hash) = Bench.calibrationProbe()
    assert(hash == 0x6f1df10f98500ad9L, f"probe hash drifted: $hash%016x")
    assert(ms > 0, "probe must take measurable time (DCE suspected)")
    // different seed → different hash (the sweep really reads the array)
    val (_, hash2) = Bench.calibrationProbe(seed = 1L)
    assert(hash2 != hash)
  }

  test("InWindowSampler: deterministic sweep hashes (pinned), samples recorded, JSON fields present") {
    val sampler = new Bench.InWindowSampler(periodMs = 50L)
    // pinned hash = anti-DCE witness, same contract as calibrationProbe: if
    // the sweep is elided or the constants drift, the in-window wall/cpu
    // numbers stop measuring the documented 16 MB workload
    assert(sampler.sweepHash == sampler.sweepHash, "sweep must be deterministic")
    val h = sampler.sweepHash
    assert(h == 0x828faaa04855dcafL, f"in-window sweep hash drifted: $h%016x")
    // same contract for the 128 MB bandwidth fold: an elided or drifted fold
    // makes calibration_inwindow_bw_* stop measuring the documented stream
    assert(sampler.bwSweepHash == sampler.bwSweepHash, "bw fold must be deterministic")
    val bh = sampler.bwSweepHash
    assert(bh == 0x286993de5d301928L, f"in-window bw fold hash drifted: $bh%016x")
    // a different seed reads a different array → different hashes
    val other = new Bench.InWindowSampler(seed = 1L)
    assert(other.sweepHash != h)
    assert(other.bwSweepHash != bh)
    sampler.start()
    Thread.sleep(300)
    val samples = sampler.stop()
    assert(samples.nonEmpty, "sampler must record at least one sample")
    assert(samples.forall(_.wallMicros > 0), s"zero-wall sample (DCE suspected): $samples")
    assert(samples.map(_.offsetMs) == samples.map(_.offsetMs).sorted, "samples must be time-ordered")
    // bwEvery=5 with tick 0 sampled → a 300 ms / 50 ms window has ≥ 1
    val bwSamples = sampler.bwSamples
    assert(bwSamples.nonEmpty, "bw probe must record at least one sample (tick 0)")
    assert(bwSamples.forall(_.mbps > 0), s"non-positive bandwidth sample: $bwSamples")
    val json = Bench.inWindowJson(samples, bwSamples, sampler.lastHash, sampler.lastBwHash)
    for (
      field <- Seq(
        "calibration_inwindow_n",
        "calibration_inwindow_wall_median_ms",
        "calibration_inwindow_wall_max_ms",
        "calibration_inwindow_cpu_median_ms",
        "calibration_inwindow_hash",
        "calibration_inwindow_bw_n",
        "calibration_inwindow_bw_median_mbps",
        "calibration_inwindow_bw_min_mbps",
        "calibration_inwindow_bw_hash"
      )
    ) assert(json.contains("\"" + field + "\":"), s"missing $field in $json")
    assert(json.contains(s""""calibration_inwindow_n":${samples.length}"""))
    assert(json.contains(f""""calibration_inwindow_hash":"$h%016x""""), json)
    assert(json.contains(s""""calibration_inwindow_bw_n":${bwSamples.length}"""))
    assert(json.contains(f""""calibration_inwindow_bw_hash":"$bh%016x""""), json)
  }

  test("writeBenchJson: file content equals the stdout line; IO failure is non-fatal") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_out")
    val line = """{"metric":"rollup_points_per_sec","value":42}"""
    val p = Bench.writeBenchJson(line, s"$dir/BENCH_LAST.json")
    assert(p.isDefined && java.nio.file.Files.readString(p.get) == line + "\n")
    // overwrite on the next run, no tmp residue
    val p2 = Bench.writeBenchJson(line.replace("42", "43"), s"$dir/BENCH_LAST.json")
    assert(java.nio.file.Files.readString(p2.get).contains("43"))
    val names = {
      val s = java.nio.file.Files.list(dir)
      try { val it = s.iterator(); val b = Seq.newBuilder[String]; while (it.hasNext) b += it.next().getFileName.toString; b.result() }
      finally s.close()
    }
    assert(names == Seq("BENCH_LAST.json"), s"tmp residue: $names")
    // an unwritable path must not fail the bench (stdout already has the line)
    assert(Bench.writeBenchJson(line, "/nonexistent-root-dir/x/y.json").isEmpty)
  }
}
