package graft.spark

import org.apache.spark.sql.functions._
import graft.ann.Ann

/** The q21/q26 DuckDB oracles model the hot-bucket cap as a whole-bucket
  * DROP (`WHERE bsz <= cap`) while the engine THINS over-cap buckets
  * (graft.spark.Thinning.survivesCap) — the two coincide ONLY while no
  * fixture bucket exceeds the cap. That precondition was previously guarded
  * indirectly (pinned row counts); this spec asserts it by name, so a
  * driver fixture regeneration that produces a hot bucket trips
  * "fixture bucket exceeds the qNN oracle cap" instead of an opaque
  * q21/q26 hash mismatch.
  *
  * Parameters mirror the SparkEntry queries exactly:
  *   q21 lshTopK      — nPlanes = 6, nTables = 8, cap 4096 (lshTopK default)
  *   q26 nearDupPairs — nPlanes = 6, nTables = 6, cap 1024 (nearDupPairs default)
  * sf0.001/sf0.01 are the spec/driver-compare corpora; sf0.1 (the bench
  * corpus) is included because it's nearly free and rules the divergence
  * out of the bench draws too.
  */
class FixtureBucketCapSpec extends SparkTestBase {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(s"$d/embeddings.parquet").exists())

  private def maxBucketSize(dir: String, nPlanes: Int, nTables: Int): Long = {
    val emb = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
    val tables = array(
      (0 until nTables).map(t => struct(lit(t).as("t"), Ann.lshBucket(col("embedding"), t, nPlanes, 64).as("b"))): _*
    )
    emb
      .select(explode(tables).as("tb"))
      .groupBy(col("tb.t"), col("tb.b"))
      .agg(count(lit(1)).as("bsz"))
      .agg(max(col("bsz")))
      .head()
      .getLong(0)
  }

  test("no embeddings-fixture LSH bucket exceeds the q21 oracle cap (6 planes x 8 tables, cap 4096)") {
    assert(sfDirs.nonEmpty, "no testdata fixture present")
    for (dir <- sfDirs) {
      val m = maxBucketSize(dir, nPlanes = 6, nTables = 8)
      assert(
        m <= 4096,
        s"$dir: fixture bucket of $m rows exceeds the q21 oracle cap 4096 — the DuckDB drop-" +
          "bucket oracle no longer matches the engine's thinning; regenerate or re-parameterize"
      )
    }
  }

  test("no embeddings-fixture LSH bucket exceeds the q26 oracle cap (6 planes x 6 tables, cap 1024)") {
    for (dir <- sfDirs) {
      val m = maxBucketSize(dir, nPlanes = 6, nTables = 6)
      assert(
        m <= 1024,
        s"$dir: fixture bucket of $m rows exceeds the q26 oracle cap 1024 — the DuckDB drop-" +
          "bucket oracle no longer matches the engine's thinning; regenerate or re-parameterize"
      )
    }
  }
}
