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

  // --- rank-based STRICT variant (hardCapSurvivors) ---

  private def threeBuckets = {
    val s = spark
    import s.implicits._
    // bucket 0: 5 rows (under cap), bucket 1: 100 rows (over), bucket 2:
    // exactly cap — the three cases the strict bound must distinguish
    ((0 until 5).map(i => (0, i.toLong)) ++
      (0 until 100).map(i => (1, i.toLong)) ++
      (0 until 10).map(i => (2, i.toLong))).toDF("b", "id")
  }

  test("hardCapSurvivors bounds every bucket at EXACTLY min(size, cap)") {
    val thinned = Thinning.hardCapSurvivors(threeBuckets, 10, Seq(col("b")), Seq(col("id"), col("b")))
    val sizes = thinned.groupBy("b").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes == Map(0 -> 5L, 1 -> 10L, 2 -> 10L), s"strict cap violated: $sizes")
    // an under-cap bucket must pass through WHOLE — same rows, not a resample
    val b0 = thinned.where(col("b") === 0).select("id").collect().map(_.getLong(0)).toSet
    assert(b0 == (0L until 5L).toSet, s"under-cap bucket must be untouched, got $b0")
  }

  test("hardCapSurvivors survivor set is deterministic across input partitioning") {
    def survivors(parts: Int): Set[(Int, Long)] =
      Thinning
        .hardCapSurvivors(threeBuckets.repartition(parts), 10, Seq(col("b")), Seq(col("id"), col("b")))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)))
        .toSet
    val one = survivors(1)
    val seven = survivors(7)
    assert(one == seven, s"survivors must not depend on partitioning: ${one.size} vs ${seven.size}")
  }

  test("hardCapSurvivors picks independent survivor sets per bucket (salt includes bucket identity)") {
    val s = spark
    import s.implicits._
    // two over-cap buckets with IDENTICAL id populations: bucket-salted
    // ordering must pick different survivors, same guarantee survivesCap's
    // salting gives the multi-table LSH recall argument
    val df = (0 until 100).flatMap(i => Seq((0, i.toLong), (1, i.toLong))).toDF("b", "id")
    val byBucket = Thinning
      .hardCapSurvivors(df, 10, Seq(col("b")), Seq(col("id"), col("b")))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (b, rows) => b -> rows.map(_.getLong(1)).toSet }
    assert(byBucket(0).size == 10 && byBucket(1).size == 10, s"both buckets must hold exactly cap: $byBucket")
    assert(byBucket(0) != byBucket(1), s"bucket-salted survivor sets must differ, got identical ${byBucket(0)}")
  }

  test("hardCapSurvivors rejects cap below 1 and an empty bucket identity eagerly") {
    val e1 = intercept[IllegalArgumentException](Thinning.hardCapSurvivors(threeBuckets, 0, Seq(col("b")), Seq(col("id"))))
    assert(e1.getMessage.contains("cap"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](Thinning.hardCapSurvivors(threeBuckets, 10, Seq.empty, Seq(col("id"))))
    assert(e2.getMessage.contains("bucket"), e2.getMessage)
  }
}
