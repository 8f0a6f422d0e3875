package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{ceil, col, lit, pmod, row_number, xxhash64}

/** Deterministic hot-bucket thinning, shared by the ANN LSH tables
  * (graft.ann.Ann.bucketedCapped) and the MinHash banding
  * (graft.text.TextOps.minHashCandidatePairs) so the invariant lives in one
  * place: a bucket of B rows would emit B² self-join rows, so beyond `cap`
  * the bucket is THINNED to ≈cap survivors — never dropped wholesale, since
  * an over-cap bucket is the strongest duplicate signal there is and
  * dropping it returns zero results exactly where results matter most.
  *
  * The survivor hash MUST be salted with the bucket identity (the salt
  * columns): an unsalted row-id hash picks the same survivors in every
  * bucket/table, so a row whose hash misses the modulus is thinned out of
  * ALL of them at once — deterministically hiding its pairs and destroying
  * any multi-table recall guarantee. Per-bucket salting makes survival
  * independent across buckets.
  *
  * TWO MODES, same survivor-selection principle (salted hash):
  *
  *  - `survivesCap` (the DEFAULT everywhere): hash-modulus. The cap is an
  *    EXPECTED-VALUE bound, not a hard one: a row survives when its salted
  *    hash ≡ 0 mod ceil(B/cap), so the survivor count is binomial with mean
  *    ≈ cap (stddev ≈ √cap) — an unlucky bucket can exceed `cap` by a few
  *    √cap. Downstream sizing ("join output ≈ |buckets|·cap²") holds in
  *    expectation and concentrates tightly for the caps used here (≥ 256).
  *    Cheap: a pure per-row predicate against a precomputed bucket size —
  *    no sort, no extra shuffle beyond what the caller already has.
  *
  *  - `hardCapSurvivors`: rank-based. Rows are ranked per bucket by their
  *    salted hash (hash first, salt columns as total-order tiebreakers) and
  *    only the top `cap` survive — max bucket size ≤ cap EXACTLY, for
  *    callers whose downstream sizing needs the strict |buckets|·cap bound.
  *    The price is a window (`row_number` over partitionBy(bucket)): every
  *    row — payload included — funnels through ≤ |buckets| tasks and pays a
  *    per-bucket sort, which is exactly the funnel the ANN census design
  *    avoids (Ann.bucketedCapped's scaladoc). Config, not default.
  */
object Thinning {

  /** hash-modulus mode: in-expectation cap (see object scaladoc).
    *
    * @param bucketSize column holding the bucket's total row count
    * @param cap        max rows a bucket may keep (≥ 1)
    * @param salt       row id + the full bucket identity, e.g. (vec_id, t, b)
    * @return boolean predicate: row survives the cap
    */
  def survivesCap(bucketSize: Column, cap: Int, salt: Column*): Column = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    bucketSize <= cap ||
    pmod(xxhash64(salt: _*), ceil(bucketSize.cast("double") / cap).cast("long")) === 0
  }

  /** rank-based mode: STRICT cap (see object scaladoc). Under-cap buckets
    * pass through whole (rank ≤ cap is vacuous there), so no bucket-size
    * census is needed at all — the window replaces it. Survivor choice is
    * deterministic: ordered by the per-bucket-salted hash with the salt
    * columns as tiebreakers (ties in the 64-bit hash are possible; an
    * under-specified order would make survivors partitioning-dependent).
    *
    * @param df     frame to thin
    * @param cap    max rows a bucket may keep (≥ 1) — exact upper bound
    * @param bucket the full bucket identity, e.g. (t, b)
    * @param salt   row id + bucket identity (same contract as survivesCap)
    */
  def hardCapSurvivors(df: DataFrame, cap: Int, bucket: Seq[Column], salt: Seq[Column]): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(bucket.nonEmpty, "bucket identity columns must be non-empty")
    val w = Window.partitionBy(bucket: _*).orderBy((xxhash64(salt: _*) +: salt): _*)
    df.withColumn("_thin_rk", row_number().over(w))
      .where(col("_thin_rk") <= cap)
      .drop("_thin_rk")
  }
}
