package graft.spark

import org.apache.spark.sql.functions._

/** Direct unit pins for the shared hot-bucket thinning predicate — the
  * integration specs (OpsSpec ANN/minhash thinning) cover end-to-end
  * behavior; these pin the helper's own contract.
  */
class ThinningSpec extends SparkTestBase {

  private lazy val ids = spark.range(1000).toDF("id")

  test("buckets at or under cap keep every row") {
    val kept = ids.where(Thinning.survivesCap(lit(100L), 100, col("id"), lit(0))).count()
    assert(kept == 1000L, s"under-cap bucket must be untouched, kept $kept")
  }

  test("over-cap buckets thin to ≈cap survivors") {
    // modulus = ceil(1000/100) = 10 → expected 100 survivors, Binomial
    // spread; deterministic for this fixture, bounds are statistical slack
    val kept = ids.where(Thinning.survivesCap(lit(1000L), 100, col("id"), lit(0))).count()
    assert(kept > 50 && kept < 200, s"expected ≈100 of 1000 survivors, got $kept")
  }

  test("distinct salts pick distinct survivor sets (per-bucket independence)") {
    def survivors(salt: Int): Set[Long] =
      ids.where(Thinning.survivesCap(lit(1000L), 100, col("id"), lit(salt))).collect().map(_.getLong(0)).toSet
    val a = survivors(1)
    val b = survivors(2)
    assert(a.nonEmpty && b.nonEmpty && a != b, s"salted survivor sets must differ: |a|=${a.size} |b|=${b.size}")
  }

  test("cap below 1 is rejected eagerly") {
    val e = intercept[IllegalArgumentException](Thinning.survivesCap(lit(10L), 0, col("id")))
    assert(e.getMessage.contains("cap"), e.getMessage)
  }
}
