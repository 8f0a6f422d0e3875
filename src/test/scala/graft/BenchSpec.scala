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
