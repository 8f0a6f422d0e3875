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
}
