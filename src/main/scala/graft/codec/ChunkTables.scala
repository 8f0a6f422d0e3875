package graft.codec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunked storage of series points as compressed BinaryType columns
  * (north_rule: "delta-of-delta timestamp + Gorilla XOR value compression
  * packed into binary chunk columns"). One chunk per (scope, metric,
  * chunk_start) window; chunk size bounded by the window/resolution ratio,
  * so collect_list stays small and bounded per group.
  */
object ChunkTables {

  private val encodeUdf =
    udf((ts: Seq[Long], vs: Seq[Double]) => ChunkCodec.encode(ts.toArray, vs.toArray))

  // decode path is a native Generator (graft.functions.ChunkExplode) — the
  // former udf→Seq→explode pipeline copied every chunk twice before emitting

  /** points (scope, metric, bucket, value) → chunks (scope, metric,
    * chunk_start, n_points, min_bucket, max_bucket, data BINARY)
    */
  def pack(points: DataFrame, chunkSeconds: Long = 86400L): DataFrame =
    points
      // FLOOR mod, not %: Spark's % takes the dividend's sign, so a
      // pre-epoch bucket (e.g. -10) would land in the NEXT-higher window
      // (chunk_start 0, below min_bucket), breaking the chunk-size bound
      // and the window key for any pre-1970 timestamp
      .withColumn("chunk_start", col("bucket") - pmod(col("bucket"), lit(chunkSeconds)))
      .groupBy("scope", "metric", "chunk_start")
      .agg(
        sort_array(collect_list(struct(col("bucket"), col("value")))).as("_pts"),
        count(lit(1)).as("n_points"),
        min("bucket").as("min_bucket"),
        max("bucket").as("max_bucket")
      )
      .select(
        col("scope"),
        col("metric"),
        col("chunk_start"),
        col("n_points"),
        col("min_bucket"),
        col("max_bucket"),
        encodeUdf(col("_pts.bucket"), col("_pts.value")).as("data")
      )

  /** chunks → points; min/max_bucket columns let Catalyst prune whole chunks
    * on time predicates before any decode happens.
    */
  def unpack(chunks: DataFrame): DataFrame =
    chunks.select(
      col("scope"),
      col("metric"),
      graft.functions.ChunkExplode.chunkExplode(col("data"))
    )
}
