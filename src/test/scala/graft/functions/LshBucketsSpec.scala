package graft.functions

import graft.ann.Ann
import graft.spark.SparkTestBase
import org.apache.spark.sql.functions._

/** The round-8 optimization replaced the composable per-table
  * array(struct(t, lshBucket…)) with the single native LshBuckets
  * expression (JIT-size motivation in its scaladoc). This spec pins the
  * two forms bucket-identical — including the degenerate inputs whose
  * null-poisoned dots must fall to bucket 0 — so a future edit to either
  * path trips here instead of silently skewing LSH recall.
  */
class LshBucketsSpec extends SparkTestBase {

  private val nTables = 4
  private val nPlanes = 6
  private val dims = 8

  private def composable = array(
    (0 until nTables).map(t => struct(lit(t).as("t"), Ann.lshBucket(col("embedding"), t, nPlanes, dims).as("b"))): _*
  )

  test("LshBuckets ≡ composable lshBucket on a deterministic corpus") {
    val s = spark
    import s.implicits._
    val emb = (0 until 200)
      .map(i => (i.toLong, (0 until dims).map(d => math.sin(i * 31 + d) * 3 - 1).toArray))
      .toDF("vec_id", "embedding")
    val a = emb
      .select(col("vec_id"), explode(LshExpressions.lshBuckets(col("embedding"), nTables, nPlanes, dims)).as("tb"))
      .select(col("vec_id"), col("tb.t"), col("tb.b"))
      .collect()
      .map(_.toSeq)
    val b = emb
      .select(col("vec_id"), explode(composable).as("tb"))
      .select(col("vec_id"), col("tb.t"), col("tb.b"))
      .collect()
      .map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("degenerate embeddings land on bucket 0 for every table, like the composable form") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Array(1.0, 2, 3, 4, 5, 6, 7, 8)),            // healthy
      (2L, Array(1.0, 2, 3)),                           // wrong dims
      (3L, null.asInstanceOf[Array[Double]]),           // null array
      (4L, Array(Double.NaN, 2, 3, 4, 5, 6, 7, 8)),     // NaN element → NaN dot, bit 0
      (5L, Array(Double.PositiveInfinity, 2, 3, 4, 5, 6, 7, 8))
    )
    val emb = rows.toDF("vec_id", "embedding")
    def buckets(c: org.apache.spark.sql.Column) = emb
      .select(col("vec_id"), explode(c).as("tb"))
      .select(col("vec_id"), col("tb.t"), col("tb.b"))
      .collect()
      .map(_.toSeq)
      .toSeq
    val native = buckets(LshExpressions.lshBuckets(col("embedding"), nTables, nPlanes, dims))
    val legacy = buckets(composable)
    assert(native == legacy)
    // wrong-dims / null rows: every table's bucket is 0
    assert(native.filter(r => Seq(2L, 3L).contains(r.head)).forall(_(2) == 0L))
  }
}
