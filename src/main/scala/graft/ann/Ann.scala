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

  /** deterministic random-hyperplane LSH: plane (table, p)'s weight for
    * dimension d is a closed-form pseudo-random in [-1, 1) derived from
    * xxhash64(table, p, d) — no RNG state, reproducible at any parallelism.
    * Bucket = sign bits of the nPlanes dot products.
    */
  def lshBucket(emb: org.apache.spark.sql.Column, table: Int, nPlanes: Int): org.apache.spark.sql.Column = {
    def planeWeight(p: Int) =
      transform(
        sequence(lit(0), size(emb) - 1),
        d => (pmod(xxhash64(lit(table), lit(p), d), lit(2000000L)).cast("double") / 1000000.0) - 1.0
      )
    val bits = (0 until nPlanes).map { p =>
      val dot = aggregate(zip_with(emb, planeWeight(p), (x, w) => x * w), lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** IVF (inverted-file) ANN: a deterministic coarse quantizer — centroids
    * are the embeddings of evenly-strided corpus rows (closed-form pick, no
    * RNG) refined by `lloydIters` distributed k-means steps — then search
    * probes only the `nProbe` nearest centroid cells. Candidate join key is
    * the cell id; at 10^9 vectors the cross product never materializes.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      lloydIters: Int = 2
  ): DataFrame = {
    // deterministic seed centroids: evenly strided over the lowest vec_ids
    val strided = corpus.orderBy("vec_id").limit(nCells * 4).collect()
    var centroids: Array[(Int, Seq[Double])] = (0 until nCells).map { i =>
      val r = strided((i * strided.length) / nCells)
      (i, r.getAs[scala.collection.Seq[Double]]("embedding").toSeq)
    }.toArray

    def assignExpr(cs: Array[(Int, Seq[Double])]): org.apache.spark.sql.Column = {
      // argmin over cells of squared distance = argmax of (2x·c − |c|²)
      val scored = cs.map { case (i, c) =>
        val carr = array(c.map(lit): _*)
        val dot = aggregate(zip_with(col("embedding"), carr, (x, y) => x * y), lit(0.0), (a, v) => a + v)
        val norm = c.map(v => v * v).sum
        struct((dot * 2 - norm).as("s"), lit(i).as("cell"))
      }
      greatest(scored: _*).getField("cell")
    }

    var it = 0
    while (it < lloydIters) {
      val assigned = corpus.withColumn("cell", assignExpr(centroids))
      val dims = centroids(0)._2.length
      val updated = assigned
        .groupBy("cell")
        .agg(
          array((0 until dims).map(d => avg(element_at(col("embedding"), d + 1))): _*).as("c")
        )
        .collect()
        .map(r => r.getAs[Int]("cell") -> r.getAs[scala.collection.Seq[Double]]("c").toSeq)
        .toMap
      centroids = centroids.map { case (i, old) => (i, updated.getOrElse(i, old)) }
      it += 1
    }

    val cells = corpus.withColumn("cell", assignExpr(centroids))
    // queries probe their nProbe nearest cells
    val centroidScores = centroids.map { case (i, c) =>
      val carr = array(c.map(lit): _*)
      val dot = aggregate(zip_with(col("q_emb"), carr, (x, y) => x * y), lit(0.0), (a, v) => a + v)
      val norm = c.map(v => v * v).sum
      struct((dot * 2 - norm).as("s"), lit(i).as("cell"))
    }
    val q = broadcast(
      queries
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        .withColumn("_cells", slice(reverse(array_sort(array(centroidScores: _*))), 1, nProbe))
        .select(col("query_id"), col("q_emb"), explode(col("_cells").getField("cell")).as("cell"))
    )
    val scored = cells
      .join(q, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** embedding-cosine near-duplicate pairs (dedup family): multi-table LSH
    * candidates over the WHOLE corpus (self-join on (table, bucket), not a
    * query set), exact cosine only on candidates, keep pairs ≥ minCosine.
    */
  def nearDupPairs(corpus: DataFrame, minCosine: Double, nPlanes: Int = 6, nTables: Int = 6): DataFrame = {
    val tables = array(
      (0 until nTables).map(t => struct(lit(t).as("t"), lshBucket(col("embedding"), t, nPlanes).as("b"))): _*
    )
    val bucketed = corpus
      .select(col("vec_id"), col("embedding"), explode(tables).as("tb"))
      .select(col("vec_id"), col("embedding"), col("tb.t").as("t"), col("tb.b").as("b"))
    val pairs = bucketed
      .as("a")
      .join(bucketed.as("b"), col("a.t") === col("b.t") && col("a.b") === col("b.b") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("a.embedding").as("ea"), col("b.embedding").as("eb"))
      .dropDuplicates("id_a", "id_b")
    pairs
      .select(col("id_a"), col("id_b"), cosine(col("ea"), col("eb")).as("sim"))
      .where(col("sim") >= minCosine)
  }

  /** Multi-table LSH ANN: nTables independent hash tables of nPlanes sign
    * bits each; a candidate is any corpus vector sharing (table, bucket) with
    * the query in ANY table (recall grows as 1−(1−p^planes)^tables). Only
    * candidates get exact cosine — the shuffle key is (table, bucket), never
    * the full |Q|×|N| cross product.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 8, nTables: Int = 8): DataFrame = {
    val tables = array((0 until nTables).map(t => struct(lit(t).as("t"), lshBucket(col("embedding"), t, nPlanes).as("b"))): _*)
    val c = corpus
      .select(col("vec_id"), col("embedding"), explode(tables).as("tb"))
      .select(col("vec_id"), col("embedding"), col("tb.t").as("t"), col("tb.b").as("b"))
    val qtables = array((0 until nTables).map(t => struct(lit(t).as("t"), lshBucket(col("q_emb"), t, nPlanes).as("b"))): _*)
    val q = broadcast(
      queries
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        .select(col("query_id"), col("q_emb"), explode(qtables).as("tb"))
        .select(col("query_id"), col("q_emb"), col("tb.t").as("t"), col("tb.b").as("b"))
    )
    val candidates = c
      .join(q, Seq("t", "b"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("q_emb"), col("embedding"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates
      .select(col("query_id"), col("neighbor_id"), cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
