package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (ARRAY<FLOAT>). Brute-force cosine is the correctness baseline (broadcast
  * the query set, codegen'd zip_with/aggregate dot products — no UDF); the
  * scale paths are random-hyperplane LSH bucketing and an IVF coarse
  * quantizer, so candidate joins shuffle on bucket/cell ids instead of
  * computing |Q|×|N| similarities.
  *
  * Scale guardrails (round-2): hyperplane weights are driver-computed
  * splitmix64 constants inlined as array literals (the round-1 per-row
  * per-dimension xxhash64 inside interpreted higher-order functions dominated
  * runtime); every self-join has a hot-bucket cap; candidate dedup happens
  * AFTER scoring on (id, id, sim) rows so embedding payloads never ride
  * through a dedup shuffle; IVF centroids are DATA in a broadcast single-row
  * frame, not plan literals, and Lloyd refinement is a distributed
  * explode-by-dimension aggregation with no driver collect.
  *
  * PRECONDITION: `vec_id` is unique in the corpus. The exact paths
  * (brute/IVF) emit one row per corpus row, so a duplicated id would occupy
  * multiple top-k slots, while the LSH path collapses duplicates via its
  * (query, neighbor) max-aggregate — feed deduplicated ids.
  */
object Ann {

  /** cosine similarity between two double-array columns. Runs on the native
    * codegen'd DotProduct/SquaredNorm expressions (graft.functions) — the
    * zip_with/aggregate formulation pays the lambda interpreter per element
    * per candidate; accumulation order is identical, results bit-equal.
    *
    * DEGENERATE-INPUT guard: an unguarded 0/0 = NaN sorts ABOVE every
    * double in Spark, so a zero-norm (failed-encoder) embedding would take
    * rank 1 in every top-k window and pass every `sim >= threshold` filter.
    * Every degenerate pair scores -1 (never a neighbor): a zero denominator
    * yields NULL from try_divide (ANSI `/ 0` on doubles THROWS — try_divide,
    * not nanvl, is what covers zero norms) and coalesce maps it to -1, while
    * NaN/Inf ELEMENTS surface as a NaN quotient that nanvl maps to -1. The
    * guarded tree itself lives in VectorExpressions.cosine — the SAME tree
    * backs the SQL cosine_similarity function, so the two surfaces cannot
    * diverge — with each norm evaluated once.
    */
  def cosine(a: Column, b: Column): Column = graft.functions.VectorExpressions.cosine(a, b)

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

  // ---- random-hyperplane LSH -------------------------------------------------

  /** splitmix64 finalizer — public-domain bit mixer (Steele et al.,
    * "Fast Splittable Pseudorandom Number Generators", OOPSLA'14).
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** deterministic plane weight in [-1, 1) for (table, plane, dim).
    * private[graft]: SparkEntry inlines the same constants into the DuckDB
    * oracle SQL, making the LSH queries oracle-able despite their "random"
    * projections.
    */
  private[graft] def planeWeight(table: Int, plane: Int, dim: Int): Double =
    ((mix64(table.toLong * 1000003L + plane.toLong * 8191L + dim) >>> 11).toDouble /
      (1L << 53).toDouble) * 2.0 - 1.0

  /** LSH bucket = sign bits of nPlanes hyperplane dot products. The weights
    * are driver-computed constants inlined as ONE array literal per plane
    * (`typedlit(Array[Double])` → a single Catalyst Literal): reproducible at
    * any parallelism and ~100× cheaper per row than deriving each weight from
    * a hash expression inside the lambda. A per-element `array(lit, …)` tree
    * would carry nPlanes·nTables·dims literal NODES through analysis and
    * constant folding on every plan — at 8 tables × 6 planes × 64 dims that
    * is ~3,000 extra expression nodes per sweep, measured as over half of
    * q21's wall time at sf0.1 (planning, not data work).
    */
  def lshBucket(emb: Column, table: Int, nPlanes: Int, dims: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val w = typedlit((0 until dims).map(d => planeWeight(table, p, d)).toArray)
      val dot = graft.functions.VectorExpressions.dot(emb, w)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** embedding dimensionality: the caller-supplied value when given (> 0),
    * else inferred with a one-row Spark job — a hidden `.head` in a library
    * entry point is three extra jobs per ANN call, so callers that know
    * their dims (they almost always do) should pass them. An empty corpus
    * (or all-null embeddings) cannot be inferred from and fails with a
    * clear message instead of a bare NoSuchElementException.
    */
  private def resolveDims(df: DataFrame, dims: Int): Int =
    if (dims > 0) dims
    else
      df.where(col("embedding").isNotNull)
        .select(size(col("embedding")))
        .limit(1)
        .collect()
        .headOption
        .map(_.getInt(0))
        .getOrElse(
          throw new IllegalArgumentException("cannot infer embedding dims from an empty corpus — pass dims explicitly")
        )

  /** argument validation shared by the public LSH entry points — called
    * BEFORE resolveDims so an invalid call fails from the arguments alone
    * instead of first paying a dims-inference Spark job. nPlanes/nTables
    * are bounded so the bucket census (see bucketedCapped) stays genuinely
    * broadcastable: it has up to nTables·2^nPlanes rows, and a caller-
    * chosen nPlanes of, say, 24 would ship hundreds of millions of census
    * rows to the driver and every executor — the forced broadcast must not
    * become its own OOM at exactly the scale the cap exists for.
    */
  private def requireLshParams(nPlanes: Int, nTables: Int, maxBucketSize: Int): Unit = {
    // nPlanes ≤ 20 is IMPLIED by the census bound (nTables ≥ 1), stated
    // first so the shift below cannot wrap
    require(nPlanes >= 1 && nPlanes <= 20, s"nPlanes must be in 1..20, got $nPlanes")
    require(nTables >= 1, s"nTables must be positive, got $nTables")
    require(
      (nTables.toLong << nPlanes) <= (1L << 20),
      s"nTables * 2^nPlanes = ${nTables.toLong << nPlanes} bucket-census rows would not stay broadcastable (limit 2^20)"
    )
    require(maxBucketSize >= 1, s"maxBucketSize must be >= 1, got $maxBucketSize")
  }

  /** (vec_id, embedding, t, b) rows for all tables, with a per-(t, b)
    * hot-bucket cap. A bucket of B rows would emit B² join rows, so beyond
    * maxBucketSize the bucket is THINNED to ≈cap rows by the deterministic
    * per-bucket-salted hash filter (graft.spark.Thinning — the salt
    * rationale lives there), bounding the join output by ≈|buckets|·cap²
    * in expectation (the hash-modulus survivor count is binomial with mean
    * cap, stddev √cap — see Thinning's scaladoc; not a hard cutoff).
    * Thinning, not dropping: the bucket id space is only nTables·2^nPlanes
    * values, so at corpus scale EVERY bucket exceeds any fixed cap —
    * dropping whole hot buckets would silently return zero results exactly
    * at scale (the sf-scale oracles sit under the cap and cannot see it);
    * a sampled bucket degrades to partial recall instead. The census is an
    * aggregate + broadcast join (≤ nTables·2^nPlanes rows by construction,
    * enforced by requireLshParams), NOT a window — a window's
    * partitionBy(t, b) would funnel the whole corpus, embeddings included,
    * through ≤ |buckets| tasks.
    *
    * `hardCap = true` switches to the rank-based STRICT variant
    * (Thinning.hardCapSurvivors): max bucket size ≤ cap exactly, for
    * callers whose downstream sizing needs the hard |buckets|·cap bound.
    * It replaces the census with exactly the window funnel the default
    * avoids (every row, embedding payload included, through ≤ |buckets|
    * tasks + a per-bucket sort) — a real cost at scale, which is why
    * hash-modulus (in-expectation cap, binomial survivors) stays the
    * default. Both modes pick survivors by the same per-bucket-salted hash.
    */
  private[graft] def bucketedCapped(
      corpus: DataFrame,
      nPlanes: Int,
      nTables: Int,
      dims: Int,
      maxBucketSize: Int,
      hardCap: Boolean = false
  ): DataFrame = {
    requireLshParams(nPlanes, nTables, maxBucketSize)
    // ONE native expression for all tables' buckets (LshBuckets scaladoc):
    // the per-table array(struct(…, lshBucket…)) composition generated a
    // whole-stage method past the JVM's JIT bytecode limit — the stage ran
    // interpreted, ~1000× per-dot cost
    val tables = graft.functions.LshExpressions.lshBuckets(col("embedding"), nTables, nPlanes, dims)
    val bucketed = corpus
      .select(col("vec_id"), col("embedding"), explode(tables).as("tb"))
      .select(col("vec_id"), col("embedding"), col("tb.t").as("t"), col("tb.b").as("b"))
    if (hardCap)
      // strict mode needs no census: under-cap buckets pass the rank filter whole
      graft.spark.Thinning.hardCapSurvivors(
        bucketed, maxBucketSize, Seq(col("t"), col("b")), Seq(col("vec_id"), col("t"), col("b"))
      )
    else {
      val sizes = bucketed.groupBy("t", "b").agg(count(lit(1)).as("_bsz"))
      bucketed
        .join(broadcast(sizes), Seq("t", "b"))
        .where(graft.spark.Thinning.survivesCap(col("_bsz"), maxBucketSize, col("vec_id"), col("t"), col("b")))
        .drop("_bsz")
    }
  }

  /** embedding-cosine near-duplicate pairs (dedup family): multi-table LSH
    * candidates over the WHOLE corpus (self-join on (table, bucket), not a
    * query set), exact cosine computed in the join projection, THEN pair
    * dedup on (id_a, id_b, sim) — the dedup shuffle carries 24 bytes/row
    * instead of two embedding payloads.
    */
  def nearDupPairs(
      corpus: DataFrame,
      minCosine: Double,
      nPlanes: Int = 6,
      nTables: Int = 6,
      maxBucketSize: Int = 1024,
      dims: Int = 0,
      hardCap: Boolean = false
  ): DataFrame = {
    requireLshParams(nPlanes, nTables, maxBucketSize) // before the resolveDims job
    // The explicit repartition on the join key is load-bearing: both self-
    // join sides are the SAME plan, so the shuffle is computed once and the
    // other side reads a ReusedExchange — without it each side (and the
    // census) re-runs the scan + nTables·nPlanes plane dot products per row
    // (4 full sweeps, measured 4–6× slower at sf0.1). The shuffled frame is
    // the THINNED one: ≈|buckets|·cap ≈ nTables·2^nPlanes·cap rows in
    // expectation under the default hash-modulus mode (binomial per bucket,
    // tightly concentrated — Thinning's scaladoc), or EXACTLY ≤ that bound
    // under `hardCap = true` (rank-based, at the cost of the bucketedCapped
    // window funnel) — so the exchange stays small at 100 TB either way.
    val bucketed = bucketedCapped(corpus, nPlanes, nTables, resolveDims(corpus, dims), maxBucketSize, hardCap)
      .repartition(col("t"), col("b"))
    bucketed
      .as("a")
      .join(
        bucketed.as("b"),
        col("a.t") === col("b.t") && col("a.b") === col("b.b") && col("a.vec_id") < col("b.vec_id")
      )
      .select(
        col("a.vec_id").as("id_a"),
        col("b.vec_id").as("id_b"),
        cosine(col("a.embedding"), col("b.embedding")).as("sim")
      )
      .groupBy("id_a", "id_b")
      .agg(max("sim").as("sim")) // same pair in several tables → identical sim
      .where(col("sim") >= minCosine)
  }

  /** Multi-table LSH ANN: nTables independent hash tables of nPlanes sign
    * bits each; a candidate is any corpus vector sharing (table, bucket) with
    * the query in ANY table (recall grows as 1−(1−p^planes)^tables). Exact
    * cosine runs in the candidate-join projection; dedup + top-k operate on
    * (query_id, neighbor_id, sim) rows only.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nPlanes: Int = 8,
      nTables: Int = 8,
      maxBucketSize: Int = 4096,
      dims: Int = 0,
      hardCap: Boolean = false
  ): DataFrame = {
    requireLshParams(nPlanes, nTables, maxBucketSize) // before the resolveDims job
    val dims0 = resolveDims(corpus, dims)
    val c = bucketedCapped(corpus, nPlanes, nTables, dims0, maxBucketSize, hardCap)
    val qtables = graft.functions.LshExpressions.lshBuckets(col("q_emb"), nTables, nPlanes, dims0)
    val q = broadcast(
      queries
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        .select(col("query_id"), col("q_emb"), explode(qtables).as("tb"))
        .select(col("query_id"), col("q_emb"), col("tb.t").as("t"), col("tb.b").as("b"))
    )
    val scored = c
      .join(q, Seq("t", "b"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cosine(col("q_emb"), col("embedding")).as("sim"))
      .groupBy("query_id", "neighbor_id")
      .agg(max("sim").as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  // ---- IVF -------------------------------------------------------------------

  /** All centroids as ONE broadcastable row: (cells ARRAY<STRUCT<cell INT,
    * c ARRAY<DOUBLE>, norm DOUBLE>>). Centroids are DATA, not plan literals —
    * at real cell counts (4k–64k) inlining them into the plan explodes
    * codegen; a single-row cross join scales to any nCells.
    */
  private def centroidRow(assigned: DataFrame, dims: Int): DataFrame = {
    // ONE aggregation: per-cell mean as `dims` avg columns over
    // try_element_at — the former posexplode → groupBy(cell, d) →
    // collect_list → transform pyramid cost two extra exchanges and a
    // dims-fold row blowup per Lloyd iteration. Same partial-aggregation
    // value stream per dimension, so the centroid doubles are the same
    // modulo partial-merge order (which the old shape did not pin either).
    // try_element_at (not element_at): a ragged short embedding yields null
    // for its missing dims — avg ignores nulls, mirroring the old shape
    // where absent (cell, d) rows simply did not contribute.
    val avgs = (0 until dims).map(d => avg(try_element_at(col("embedding"), lit(d + 1))).as(s"_m$d"))
    assigned
      .groupBy("cell")
      .agg(avgs.head, avgs.tail: _*)
      .select(col("cell"), array((0 until dims).map(d => col(s"_m$d")): _*).as("c"))
      .select(
        col("cell"),
        col("c"),
        // native SquaredNorm: same left-to-right accumulation as
        // aggregate(c, 0.0, a + v*v) — bit-identical, but a tight codegen
        // loop instead of one interpreted lambda step per element
        graft.functions.VectorExpressions.squaredNorm(col("c")).as("norm")
      )
      .groupBy()
      .agg(array_sort(collect_list(struct(col("cell"), col("c"), col("norm")))).as("cells"))
  }

  /** nearest-centroid id for `emb` given the cells array column: argmax of
    * 2·x·c − |c|² (≡ argmin squared distance), ties to the lower cell id.
    */
  private def assignCell(cells: Column, emb: Column): Column = {
    val best = aggregate(
      cells,
      struct(lit(Double.MinValue).as("s"), lit(-1).as("cell")),
      (acc, cs) => {
        // native DotProduct (accumulation order identical to the
        // zip_with+aggregate fold — bit-equal results): the composable form
        // ran the lambda interpreter per DIMENSION per cell per row
        // (nCells·dims interpreted steps/row); the native expression is one
        // eval per cell with a tight inner loop
        val dot = graft.functions.VectorExpressions.dot(emb, cs.getField("c"))
        val score = dot * 2 - cs.getField("norm")
        when(score > acc.getField("s"), struct(score.as("s"), cs.getField("cell").as("cell"))).otherwise(acc)
      }
    )
    best.getField("cell")
  }

  /** IVF (inverted-file) ANN. Seeding is a deterministic hash partition of
    * the corpus (cell₀ = xxhash64(vec_id) mod nCells → per-cell mean), then
    * `lloydIters` distributed k-means steps; every step is ONE per-cell
    * aggregation + a single-row broadcast cross join — no driver collect,
    * no orderBy, no plan-literal centroids. Search probes the nProbe
    * nearest cells per query; the candidate join key is the cell id.
    * The centroid aggregation is sized by the corpus's actual embedding
    * width (inferred with a one-row job); a caller-supplied `dims > 0` is
    * VALIDATED against it and a mismatch fails loudly instead of silently
    * degenerating (see the guard below).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      lloydIters: Int = 2,
      dims: Int = 0
  ): DataFrame = {
    // dims is authoritative for the centroid aggregation, so validate it
    // against the data (one-row job): a mismatched caller value would
    // otherwise null-poison every centroid tail via try_element_at, null
    // every assignment score, and silently collapse ALL rows into cell -1 —
    // an all-pairs scan masquerading as IVF
    val dims0 = resolveDims(corpus, 0)
    require(
      dims <= 0 || dims == dims0,
      s"ivfTopK dims=$dims does not match the corpus embedding width $dims0"
    )
    val seeded = corpus.withColumn("cell", pmod(xxhash64(col("vec_id")), lit(nCells.toLong)).cast("int"))
    // EAGER localCheckpoint each round's centroid row (ONE tiny row):
    // without it every later plan re-executes the whole chain of previous
    // Lloyd passes — and cRow is only ever consumed via broadcast(), so a
    // lazy checkpoint would nest each round's FULL-CORPUS aggregation
    // inside the next round's BroadcastExchange future, putting the whole
    // Lloyd ladder under one spark.sql.broadcastTimeout at scale (tried in
    // round 8, reverted: the bench gain was noise, the timeout exposure
    // real)
    var cRow = centroidRow(seeded, dims0).localCheckpoint()
    var it = 0
    while (it < lloydIters) {
      val assigned = corpus
        .crossJoin(broadcast(cRow))
        .withColumn("cell", assignCell(col("cells"), col("embedding")))
        .select("vec_id", "embedding", "cell")
      cRow = centroidRow(assigned, dims0).localCheckpoint()
      it += 1
    }

    val cells = corpus
      .crossJoin(broadcast(cRow))
      .withColumn("cell", assignCell(col("cells"), col("embedding")))
      .select("vec_id", "embedding", "cell")

    // queries probe their nProbe nearest cells (scored against the same
    // broadcast centroid row)
    val probeScores = transform(
      col("cells"),
      cs =>
        struct(
          // native DotProduct — same fold order as zip_with+aggregate (see
          // assignCell), one eval per cell instead of dims lambda steps
          (graft.functions.VectorExpressions.dot(col("q_emb"), cs.getField("c")) * 2
            - cs.getField("norm")).as("s"),
          cs.getField("cell").as("cell")
        )
    )
    val q = broadcast(
      queries
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        .crossJoin(broadcast(cRow))
        .withColumn("_cells", slice(reverse(array_sort(probeScores)), 1, nProbe))
        .select(col("query_id"), col("q_emb"), explode(col("_cells").getField("cell")).as("cell"))
    )
    val scored = cells
      .join(q, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cosine(col("q_emb"), col("embedding")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
