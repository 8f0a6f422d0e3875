package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (ARRAY<FLOAT>). Brute-force cosine is the correctness baseline (broadcast
  * the query set, codegen'd zip_with/aggregate dot products — no UDF); the
  * scale path is random-hyperplane LSH bucketing so the candidate join
  * shuffles on bucket ids instead of computing |Q|×|N| similarities.
  */
object Ann {

  /** cosine similarity between two float-array columns as a pure expression */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** brute-force top-k: every query row against the full corpus.
    * queries is expected to be small → broadcast, corpus streams.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val scored = corpus
      .join(q, col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("sim")
      )
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** deterministic random-hyperplane LSH: plane p's weight for dimension d is
    * a closed-form pseudo-random in [-1, 1) derived from xxhash64(p, d) — no
    * RNG state, reproducible at any parallelism. Bucket = bits of
    * sign(x·plane_p) for p in [0, nPlanes).
    */
  def lshBucket(emb: org.apache.spark.sql.Column, nPlanes: Int): org.apache.spark.sql.Column = {
    def planeWeight(p: Int) =
      transform(
        sequence(lit(0), size(emb) - 1),
        d => (pmod(xxhash64(lit(p), d), lit(2000000L)).cast("double") / 1000000.0) - 1.0
      )
    val bits = (0 until nPlanes).map { p =>
      val dot = aggregate(zip_with(emb, planeWeight(p), (x, w) => x * w), lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN: only pairs sharing a bucket get exact cosine.
    * Probe multiplicity via nPlanes; smaller → more recall, bigger buckets.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 8): DataFrame = {
    val c = corpus.withColumn("bucket", lshBucket(col("embedding"), nPlanes))
    val q = broadcast(
      queries
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        .withColumn("bucket", lshBucket(col("q_emb"), nPlanes))
    )
    val scored = c
      .join(q, Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
