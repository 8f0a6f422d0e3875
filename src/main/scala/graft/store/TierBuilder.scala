package graft.store

import graft.pipeline.{Derive, SeriesOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resumable continuous-aggregate tier builder (north_rule): transcripts →
  * raw(60s) → 1m → 1h → 1d, each tier a TableStore partitioned by day with
  * per-partition lineage manifests. A rebuild after a mid-run kill skips
  * every partition whose manifest entry already exists for the same input
  * snapshot — tier rebuild is idempotent and content-identical (row-count +
  * content-hash checked by the resumability spec).
  */
object TierBuilder {

  val TierResolutions: Seq[(String, Long)] =
    Seq(("raw", 60L), ("1m", 60L), ("1h", 3600L), ("1d", 86400L))

  /** the tier partition key — private[graft] so the streaming writer uses
    * the SAME expression (divergent copies would break TTL cutoff compares
    * and Maintain compaction targeting between batch and streaming tiers)
    */
  private[graft] def withDay(df: DataFrame): DataFrame =
    df.withColumn("day", date_format(timestamp_seconds(col("bucket")), "yyyy-MM-dd"))

  /** Build all tiers; `failAfterTier` (test hook) aborts after k tiers to
    * simulate a mid-run kill. Returns per-tier snapshots.
    */
  def build(
      spark: SparkSession,
      transcripts: DataFrame,
      base: String,
      inputSnapshot: String,
      resolution: Long = 60L,
      failAfterTier: Int = Int.MaxValue
  ): Map[String, Snapshot] = {
    var result = Map.empty[String, Snapshot]

    // raw tier: derive from transcripts
    val rawStore = new TableStore(base, "tier_raw")
    val rawDf = withDay(Derive.deriveSeries(transcripts, resolution, extraMetrics = true))
    result += "raw" -> writeResumable(rawStore, rawDf, inputSnapshot)
    if (failAfterTier <= 1) return result

    // each coarser tier re-aggregates the previous tier's store
    var prevStore = rawStore
    val coarser = Seq(("1m", 60L), ("1h", 3600L), ("1d", 86400L))
    for (((name, res), idx) <- coarser.zipWithIndex) {
      val store = new TableStore(base, s"tier_$name")
      val df = withDay(
        SeriesOps.bucketSum(prevStore.read(spark).drop("day"), res)
      )
      result += name -> writeResumable(store, df, inputSnapshot)
      prevStore = store
      if (failAfterTier <= idx + 2) return result
    }
    result
  }

  /** dynamic-overwrite only the partitions NOT yet recorded for this input */
  private def writeResumable(store: TableStore, df: DataFrame, inputSnapshot: String): Snapshot = {
    val done = store.completedPartitions(inputSnapshot)
    if (done.isEmpty) store.write(df, "day", inputSnapshot)
    else {
      // persist: the distinct-days probe and the staged write would
      // otherwise each re-execute the full derive plan on resume
      val p = df.persist()
      try {
        // manifests key a null day as __HIVE_DEFAULT_PARTITION__ — compare
        // in that keyspace or the null partition reads as forever-missing
        // (and TableStore.write's isin filter would then drop its rows)
        val all = p
          .select(col("day").cast("string"))
          .distinct()
          .collect()
          .map(r => Option(r.getString(0)).getOrElse(org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.DEFAULT_PARTITION_NAME))
          .toSet
        val missing = all -- done
        // everything already landed (a completed run re-invoked): committing
        // a no-op snapshot would only churn ids toward expiry
        if (missing.isEmpty) store.currentSnapshot.get
        else store.write(p, "day", inputSnapshot, onlyPartitions = Some(missing))
      } finally p.unpersist(blocking = false)
    }
  }
}

/** Explicit skew handling for hot keys (north_rule): two-phase salted
  * aggregation — partial sums on (keys, salt), final on keys. For
  * associative aggregates this is semantics-preserving; Spark's partial
  * aggregation covers most cases, salting covers the rest (e.g. a single
  * conversation whose one reduce key exceeds an executor).
  */
object SaltedAgg {
  /** Row-unique, deterministic salt. Deriving the salt from the VALUE column
    * is a trap: a hot key whose rows all carry the same value (constant
    * counters — the common skew case) would collapse into a single salt
    * bucket and the mitigation becomes a no-op. monotonically_increasing_id
    * is unique per row and stable for a given partitioning, so partial
    * groups spread evenly regardless of value distribution, and retries of
    * a deterministic input replay the same salt (unlike rand()).
    */
  private def rowSalt(saltBuckets: Int) =
    pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong))

  /** first (partial) phase, exposed so tests can assert the skew spread */
  private[store] def sumPartials(df: DataFrame, keys: Seq[String], valueCol: String, saltBuckets: Int): DataFrame =
    df.withColumn("_salt", rowSalt(saltBuckets))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(valueCol).as("_partial"))

  def sumSalted(df: DataFrame, keys: Seq[String], valueCol: String, saltBuckets: Int): DataFrame =
    sumPartials(df, keys, valueCol, saltBuckets)
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as(valueCol))

  def countSalted(df: DataFrame, keys: Seq[String], saltBuckets: Int): DataFrame = {
    val salted = df
      .withColumn("_salt", rowSalt(saltBuckets))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
    salted
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as("cnt"))
  }
}
