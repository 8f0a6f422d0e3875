package graft.spark

import graft.codec.ChunkTables
import graft.jobs.FixtureGen
import graft.pipeline.{Derive, SeriesOps}
import graft.text.TextOps
import graft.ann.Ann
import org.apache.spark.sql.functions._

/** Distributed-operator sanity specs: chunk pack/unpack roundtrip, MinHash
  * LSH recall vs exact Jaccard, SimHash similarity behavior, ANN LSH recall
  * vs brute force, gap-fill modes.
  */
class OpsSpec extends SparkTestBase {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    // synthetic corpus with planted near-duplicates
    val base = (0 until 60).map(i => (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta iota kappa word$i tail$i more${i % 7}"))
    val dups = (0 until 10).map(i => (100L + i, s"alpha beta gamma delta epsilon zeta eta theta iota kappa word$i tail$i CHANGED${i}"))
    (base ++ dups).toDF("doc_id", "text")
  }

  test("chunk pack/unpack roundtrips points through binary columns") {
    val turns = FixtureGen.synthetic(spark, nConvs = 20, maxTurns = 2000, partitions = 2)
    val points = Derive.deriveSeries(turns, 60L)
    val packed = ChunkTables.pack(points, 86400L)
    val unpacked = ChunkTables.unpack(packed)
    assert(unpacked.count() == points.count())
    val a = points.agg(sum(col("value")), sum(col("bucket"))).head
    val b = unpacked.agg(sum(col("value")), sum(col("bucket"))).head
    assert(a == b)
    // compression: binary bytes well below 16 bytes/point
    val bytes = packed.agg(sum(length(col("data")))).head.getLong(0)
    assert(bytes < points.count() * 12, s"$bytes bytes for ${points.count()} points")
  }

  test("pack windows pre-epoch buckets into their own (floor) chunk_start") {
    val s = spark
    import s.implicits._
    // % takes the dividend's sign: bucket -10 used to land in chunk_start 0
    // (ABOVE min_bucket), merging pre- and post-epoch points in one window
    val pts = Seq(("s", "m", -10L, 1.0), ("s", "m", -86400L, 2.0), ("s", "m", 5L, 3.0))
      .toDF("scope", "metric", "bucket", "value")
    val chunks = ChunkTables.pack(pts, chunkSeconds = 86400L)
      .select("chunk_start", "min_bucket", "n_points").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(chunks.toSeq == Seq((-86400L, -86400L, 2L), (0L, 5L, 1L)), chunks.mkString(","))
    assert(chunks.forall { case (start, mn, _) => mn >= start }, "chunk_start must never exceed min_bucket")
  }

  test("minhash LSH candidates catch planted near-duplicates") {
    val sigs = TextOps.minHashSignatures(TextOps.shingles(docs, 3), 32)
    val pairs = TextOps.minHashCandidatePairs(sigs, 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TextOps
      .ngramJaccardPairs(docs, 3, minJaccard = 0.6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(exact.nonEmpty, "planted dups must be exact near-duplicates")
    val recall = exact.count(pairs.contains).toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} true pairs")
  }

  test("simhash of near-duplicates has small hamming distance") {
    val sh = TextOps.simHash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // planted pair (i, 100+i) share ~90% tokens
    val close = (0 until 10).map(i => hamming(sh(i.toLong), sh(100L + i)))
    val far = (0 until 10).map(i => hamming(sh(i.toLong), sh(((i + 23) % 60).toLong)))
    assert(close.sum < far.sum, s"close=$close far=$far")
  }

  test("ANN LSH finds most brute-force neighbors") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
    val queries = emb.where(col("vec_id") < 3)
    val brute = Ann
      .bruteForceTopK(emb, queries, 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val lsh = Ann
      .lshTopK(emb, queries, 10, nPlanes = 4, nTables = 8)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val recall = brute.count(lsh.contains).toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall $recall (4 planes x 8 tables, top-10)")
  }

  test("IVF ANN finds a reasonable share of brute-force neighbors") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
    val queries = emb.where(col("vec_id") < 3)
    // one brute-force run serves both the recall floor (pairs) and the
    // exhaustive-equivalence check (ranks) below
    val bruteRanked = Ann
      .bruteForceTopK(emb, queries, 10)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
      .toSet
    val brute = bruteRanked.map { case (q, n, _) => (q, n) }
    val ivf = Ann
      .ivfTopK(emb, queries, 10, nCells = 8, nProbe = 4, lloydIters = 2)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val recall = brute.count(ivf.contains).toDouble / brute.size
    assert(recall >= 0.4, s"IVF recall $recall (8 cells, probe 4)")
    // determinism: same plan twice, same result
    val ivf2 = Ann
      .ivfTopK(emb, queries, 10, nCells = 8, nProbe = 4, lloydIters = 2)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    assert(ivf == ivf2)
    // EXHAUSTIVE probing (nProbe == nCells) must equal brute force EXACTLY
    // (ranks included): every vector is a candidate, so any difference means
    // a scoring/assignment bug, not an approximation artifact. This is the
    // semantic identity the recall floor can't see (q27 is rows-only at the
    // driver gate — iterative Lloyd is not DuckDB-expressible).
    val exhaustive = Ann
      .ivfTopK(emb, queries, 10, nCells = 8, nProbe = 8, lloydIters = 2)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
      .toSet
    assert(exhaustive == bruteRanked, "nProbe == nCells must reduce IVF to exact brute force")
  }

  test("embedding near-dup pairs find planted duplicates") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
    // plant exact duplicates: ids 10000+i share i's embedding
    val planted = emb.where(col("vec_id") < 10).select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(planted)
    val pairs = Ann
      .nearDupPairs(corpus, minCosine = 0.999)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // identical vectors always share every LSH bucket → all 10 found
    (0 until 10).foreach(i => assert(pairs.contains((i.toLong, 10000L + i)), s"missing dup $i"))
  }

  test("zero-norm embeddings never rank as neighbors (NaN cosine guard)") {
    val s = spark
    import s.implicits._
    // 8 real vectors + one all-zeros degenerate (failed encoder output):
    // 0/0 = NaN, and Spark sorts NaN ABOVE all doubles — unguarded, the
    // zero vector would take rank 1 for every query and pass any threshold
    val real = (0 until 8).map(i => (i.toLong, Array.tabulate(4)(d => (1.0 + i + d)))).toDF("vec_id", "embedding")
    val zero = Seq((99L, Array.fill(4)(0.0))).toDF("vec_id", "embedding")
    val corpus = real.unionByName(zero)
    val queries = real.where(col("vec_id") === 0L)
    val top = Ann.bruteForceTopK(corpus, queries, 3).collect()
    assert(!top.exists(_.getLong(1) == 99L), s"zero vector must never be a top neighbor: ${top.mkString(",")}")
    assert(top.forall(r => !r.getDouble(2).isNaN), "no NaN similarity may escape")
    val dups = Ann.nearDupPairs(corpus, minCosine = 0.9, dims = 4).collect()
    assert(!dups.exists(r => r.getLong(0) == 99L || r.getLong(1) == 99L), "zero vector must not appear as a near-dup")
  }

  test("hot LSH buckets are thinned to ~cap, not dropped wholesale") {
    val s = spark
    import s.implicits._
    // 64 IDENTICAL vectors: one bucket per table of size 64, far over a cap
    // of 8. The old cap DROPPED the whole bucket → zero pairs at exactly the
    // scale the guardrail exists for; thinning keeps ≈cap rows so a sampled
    // subset of pairs still comes out.
    val corpus = (0 until 64).map(i => (i.toLong, Array(1.0, 2.0, 3.0, 4.0))).toDF("vec_id", "embedding")
    val pairs = Ann.nearDupPairs(corpus, minCosine = 0.999, nPlanes = 4, nTables = 2, maxBucketSize = 8, dims = 4)
    val n = pairs.count()
    assert(n > 0, "over-cap bucket must degrade to sampled recall, not silent emptiness")
    // survivors per bucket are ≈Binomial(64, cap/64), mean = cap = 8 — a
    // hard exact cap is hash-dependent, but the BOUND invariant must stay
    // under test: allow up to 2·cap survivors per table (P ≈ 1e-3 for a
    // correct filter, deterministic for this fixture), i.e. ≤ nTables·C(16,2)
    // distinct pairs. A dropped salt column or halved modulus (~2-4× cap
    // survivors) blows past this; the old exact ≤2·cap² was brittle instead
    assert(n <= 2L * 120, s"thinned output must stay near |buckets|·C(2·cap,2), got $n of 2016 unthinned")
  }

  test("hot-bucket thinning survivors are independent across LSH tables") {
    val s = spark
    import s.implicits._
    // 64 identical vectors land in ONE bucket per table. An UNSALTED
    // thinning hash (vec_id only) picks the same survivors in every table:
    // a vector thinned from one table is thinned from ALL of them, so a
    // near-dup pair of two unlucky ids is deterministically invisible no
    // matter how many tables — the multi-table recall guarantee is gone.
    // Per-(t, b)-salted hashing makes survival independent per table.
    val corpus = (0 until 64).map(i => (i.toLong, Array(1.0, 2.0, 3.0, 4.0))).toDF("vec_id", "embedding")
    val survivors = Ann
      .bucketedCapped(corpus, nPlanes = 4, nTables = 3, dims = 4, maxBucketSize = 8)
      .select("t", "vec_id").collect()
      .groupBy(_.getInt(0)).map { case (t, rows) => t -> rows.map(_.getLong(1)).toSet }
    assert(survivors.size == 3, s"all tables must keep some survivors: ${survivors.keySet}")
    assert(survivors.values.forall(_.nonEmpty), "thinning must never empty a bucket's survivor set")
    assert(survivors.values.toSet.size > 1, s"survivor sets must differ across tables, got $survivors")
    // union coverage: with independent per-table survival, more distinct ids
    // surface across the 3 tables than any single table keeps
    val union = survivors.values.reduce(_ ++ _)
    assert(survivors.values.forall(t => union.size > t.size), s"union ${union.size} vs ${survivors.values.map(_.size)}")
  }

  test("minhash over-cap buckets are thinned (clone groups stay visible) and empty sigs are inert") {
    val s = spark
    import s.implicits._
    // 40 IDENTICAL signatures: every band bucket has 40 docs, far over cap
    // 8 — the old wholesale drop returned ZERO candidates for exactly the
    // most-duplicated documents (257+ copies of one boilerplate doc at the
    // default cap). Thinning keeps ≈cap docs per bucket → sampled pairs.
    val sig = Array.tabulate(8)(i => (i * 17L + 3) % 97)
    val clones = (0 until 40).map(i => (i.toLong, sig)).toDF("doc_id", "sig")
    val pairs = TextOps.minHashCandidatePairs(clones, rowsPerBand = 4, maxBucketSize = 8)
    val n = pairs.count()
    assert(n > 0, "over-cap clone bucket must degrade to sampled pairs, not silent emptiness")
    // survivors are ≈Binomial(40, 1/5) per band, mean = cap = 8 — same
    // bound-under-test rationale as the ANN thinning spec: ≤ 2·cap
    // survivors per band (2 bands) keeps the |buckets|·cap² promise
    // testable without pinning the exact hash draw
    assert(n <= 2L * 120, s"thinned output must stay near bands·C(2·cap,2), got $n of 780 unthinned")
    // an EMPTY caller-supplied sig used to band as sequence(0,-1) → two
    // empty-slice bands shared by every empty-sig doc → all of them became
    // candidate pairs of each other
    val empties = Seq((100L, Array.empty[Long]), (101L, Array.empty[Long]), (0L, sig)).toDF("doc_id", "sig")
    val ep = TextOps.minHashCandidatePairs(empties, rowsPerBand = 4, maxBucketSize = 8).collect()
    assert(ep.isEmpty, s"empty sigs must produce no candidates: ${ep.mkString(",")}")
  }

  test("ANN hard-cap mode holds every LSH bucket at EXACTLY the cap") {
    val s = spark
    import s.implicits._
    // 64 identical vectors → one bucket per table, 8× over cap. The default
    // hash-modulus mode keeps ≈cap (binomial); hardCap = true must keep
    // EXACTLY cap per (t, b) — the strict |buckets|·cap bound.
    val corpus = (0 until 64).map(i => (i.toLong, Array(1.0, 2.0, 3.0, 4.0))).toDF("vec_id", "embedding")
    val byBucket = Ann
      .bucketedCapped(corpus, nPlanes = 4, nTables = 3, dims = 4, maxBucketSize = 8, hardCap = true)
      .groupBy("t", "b").count().collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(byBucket.length == 3, s"one bucket per table expected, got ${byBucket.length}")
    assert(byBucket.forall(_._2 == 8L), s"hard cap must hold exactly: ${byBucket.mkString(",")}")
    // per-table survivor independence (the multi-table recall argument)
    // must survive the mode switch: bucket identity is in the rank salt
    val sets = Ann
      .bucketedCapped(corpus, nPlanes = 4, nTables = 3, dims = 4, maxBucketSize = 8, hardCap = true)
      .select("t", "vec_id").collect()
      .groupBy(_.getInt(0)).map { case (_, rows) => rows.map(_.getLong(1)).toSet }
    assert(sets.toSet.size > 1, s"hard-cap survivor sets must still differ across tables, got $sets")
  }

  test("minhash hard-cap mode gives the strict bands·C(cap,2) pair bound") {
    val s = spark
    import s.implicits._
    // same 40-clone fixture as the default-mode test: 2 bands, each one
    // bucket of 40. hardCap = true keeps exactly 8 per band bucket, so the
    // pair count is STRICTLY ≤ 2·C(8,2) = 56 (distinct() may dedup pairs
    // the two bands' survivor sets share) — no binomial slack needed.
    val sig = Array.tabulate(8)(i => (i * 17L + 3) % 97)
    val clones = (0 until 40).map(i => (i.toLong, sig)).toDF("doc_id", "sig")
    val n = TextOps.minHashCandidatePairs(clones, rowsPerBand = 4, maxBucketSize = 8, hardCap = true).count()
    assert(n > 0, "hard-cap clone bucket must still degrade to sampled pairs, not emptiness")
    assert(n <= 2L * 28, s"strict bound bands·C(cap,2) = 56 violated: got $n")
  }

  test("simHash emits exactly one row per doc; token-less docs hash to 0") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, ""), (3L, "   "), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = TextOps.simHash(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // a plain explode dropped token-less docs from the output entirely — a
    // consumer joining simhashes back to documents lost those doc_ids
    assert(rows.keySet == Set(1L, 2L, 3L, 4L), s"one row per doc required, got ${rows.keySet}")
    assert(rows(2L) == 0L && rows(3L) == 0L && rows(4L) == 0L, s"token-less docs must hash to 0: $rows")
    assert(rows(1L) != 0L, "a real doc must not collide with the empty hash")
  }

  test("ANN on an empty corpus fails with a clear dims message, not NoSuchElementException") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](Ann.nearDupPairs(empty, 0.9))
    assert(e.getMessage.contains("pass dims explicitly"))
    // with dims given, an empty corpus is a valid empty result
    assert(Ann.nearDupPairs(empty, 0.9, dims = 4).count() == 0)
  }

  test("empty/whitespace docs count zero tokens; null text is excluded from exact dedup") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "two tokens"),
      (2L, ""),
      (3L, "   "),
      (4L, null.asInstanceOf[String]),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val counts = TextOps.withTokenCounts(docs).select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // split("") yields [''] — unfixed this read as one phantom token; null
    // text passes through as null (no fabricated count)
    assert(counts(1L).contains(2) && counts(2L).contains(0) && counts(3L).contains(0), s"got $counts")
    assert(counts(4L).isEmpty, s"null text must yield null n_tokens: $counts")
    // md5(null) is null: grouping would declare docs 4 and 5 duplicates of
    // each other and a keep_id consumer would drop a distinct document
    val dedup = TextOps.exactDedup(docs).collect()
    assert(dedup.forall(_.getLong(2) == 1L), s"null-text docs must not merge: ${dedup.mkString(",")}")
    assert(dedup.length == 3)
  }

  test("minhash banding uses every signature component (ceil bands, k not divisible)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon"), (2L, "alpha beta gamma delta epsilon"), (3L, "zz yy xx ww vv"))
      .toDF("doc_id", "text")
    // k=30 with rowsPerBand=4: truncating division banded only 28 of 30
    // components; ceil banding uses all 30 (last band is 2 wide). Identical
    // docs must still pair; k < rowsPerBand (k=2) must not create the
    // degenerate descending-sequence band shared by every doc.
    for (k <- Seq(30, 2)) {
      val sigs = TextOps.minHashSignatures(TextOps.shingles(docs, 2), k = k)
      val pairs = TextOps.minHashCandidatePairs(sigs, rowsPerBand = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)), s"k=$k: identical docs must share a band")
      assert(!pairs.contains((1L, 3L)), s"k=$k: unrelated docs must not pair via a degenerate band")
    }
    intercept[IllegalArgumentException](TextOps.minHashCandidatePairs(null, rowsPerBand = 0))
  }

  test("gap-fill modes: locf and linear") {
    val s = spark
    import s.implicits._
    val pts = Seq(("a", "m", 60L, 10.0), ("a", "m", 300L, 18.0))
      .toDF("scope", "metric", "bucket", "value")
    def vals(mode: graft.model.GapFillMode.Value) =
      SeriesOps
        .gapFill(pts, 60L, mode)
        .orderBy("bucket")
        .collect()
        .map(_.getAs[Double]("value"))
        .toSeq
    assert(vals(graft.model.GapFillMode.Zero) == Seq(10.0, 0.0, 0.0, 0.0, 18.0))
    assert(vals(graft.model.GapFillMode.Locf) == Seq(10.0, 10.0, 10.0, 10.0, 18.0))
    assert(vals(graft.model.GapFillMode.Linear) == Seq(10.0, 12.0, 14.0, 16.0, 18.0))
  }

  test("dedupGroups: connected components over pair graph") {
    val s = spark
    import s.implicits._
    // components: chain 1-2-3, pair 10-11, triangle 20-21-22 (+cross edge)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("doc_a", "doc_b")
    val groups = TextOps.dedupGroups(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(groups.view.mapValues(_._1).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    assert(groups.filter(_._2._2).keySet == Set(1L, 10L, 20L), "keep = component min")
  }

  test("dedupGroups: EMPTY pair set returns empty even at maxIter = 1") {
    // round-8 regression pin: the fused round 1 skips its convergence
    // count, so without the explicit empty-labels probe a trivially
    // converged empty input threw "did not converge in 1 rounds"
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(TextOps.dedupGroups(empty, maxIter = 1).collect().isEmpty)
  }

  test("dedupGroups: 60-node CHAIN converges within default rounds (pointer jumping)") {
    val s = spark
    import s.implicits._
    // plain min-label propagation needs O(diameter)=60 rounds here and
    // would throw at maxIter=20; path halving collapses it
    val chain = (0 until 59).map(i => (100L + i, 101L + i)).toDF("doc_a", "doc_b")
    val groups = TextOps.dedupGroups(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.size == 60 && groups.values.forall(_ == 100L), s"got ${groups.values.toSet}")
  }

  test("dedupGroups releases superseded checkpoint generations (no per-round cache leak)") {
    val s = spark
    import s.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // 40-node chain → ~6 pointer-jump rounds; a leak would retain one
    // checkpointed generation per round plus p0 and edges
    val chain = (0 until 39).map(i => (500L + i, 501L + i)).toDF("doc_a", "doc_b")
    val out = TextOps.dedupGroups(chain)
    assert(out.count() == 40)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    // only the FINAL labels checkpoint may remain live (the returned frame
    // reads it); every superseded round, p0, and edges must be unpersisted
    assert(leaked.size <= 2, s"checkpoint generations leaked: ${leaked.size} new persistent RDDs")
  }

  test("dedupGroups converges on adversarial near-Long.Max ids (no Σ overflow)") {
    val s = spark
    import s.implicits._
    // ids chosen so a Σlabel convergence check would wrap Long mid-iteration
    val a = Long.MaxValue - 1; val b = Long.MaxValue - 2; val c = Long.MaxValue - 3
    val pairs = Seq((a, b), (b, c), (5L, a)).toDF("doc_a", "doc_b")
    val groups = TextOps.dedupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(a -> 5L, b -> 5L, c -> 5L, 5L -> 5L))
  }
}
