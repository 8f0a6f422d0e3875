package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{ceil, lit, pmod, xxhash64}

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
  * The cap is an EXPECTED-VALUE bound, not a hard one: a row survives when
  * its salted hash ≡ 0 mod ceil(B/cap), so the survivor count is binomial
  * with mean ≈ cap (stddev ≈ √cap) — an unlucky bucket can exceed `cap` by
  * a few √cap. Downstream sizing ("join output ≈ |buckets|·cap²") holds in
  * expectation and concentrates tightly for the caps used here (≥ 256);
  * anything that needs a STRICT bound must rank by the salted hash and keep
  * the top `cap` instead, at the cost of a per-bucket sort.
  *
  * @param bucketSize column holding the bucket's total row count
  * @param cap        max rows a bucket may keep (≥ 1)
  * @param salt       row id + the full bucket identity, e.g. (vec_id, t, b)
  * @return boolean predicate: row survives the cap
  */
object Thinning {
  def survivesCap(bucketSize: Column, cap: Int, salt: Column*): Column = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    bucketSize <= cap ||
    pmod(xxhash64(salt: _*), ceil(bucketSize.cast("double") / cap).cast("long")) === 0
  }
}
