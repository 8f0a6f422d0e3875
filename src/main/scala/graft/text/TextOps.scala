package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data text operators over a `documents(doc_id, text, ...)` table.
  * All pure column expressions (whole-stage codegen, no UDFs); the dedup
  * family is built from explode + hash-aggregate plans that scale by
  * sharding on (doc, shingle) — no driver-side state.
  */
object TextOps {

  /** whitespace tokens, reference-style split. Empty tokens are filtered:
    * split("") yields [""], which would count one phantom token for every
    * empty/whitespace-only doc (inflating corpus token accounting at scale)
    * and feed crc32("") into fingerprints/simhashes.
    *
    * Native WordTokens expression (round 8): the composable
    * `filter(split(trim(text), \\s+), _ =!= "")` evaluates the filter
    * lambda through the expression interpreter per token (HOFs never
    * codegen) — same strings, one JIT'd eval per row instead
    * (TextExpressionsSpec pins the parity).
    */
  def tokens(text: Column): Column =
    graft.functions.TextExpressions.wordTokens(text)

  /** token count (BPE-ish subword estimate = ceil(chars/4) also provided) */
  def withTokenCounts(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens", size(tokens(col("text"))))
      .withColumn("n_subwords", ceil(length(col("text")).cast("double") / 4.0).cast("long"))

  /** quality scoring: length, punctuation/uppercase/digit/whitespace ratios,
    * stopword count — the usual cheap pretraining-corpus filters.
    */
  def withQuality(docs: DataFrame): DataFrame = {
    val len = length(col("text")).cast("double")
    def classRatio(pattern: String): Column =
      when(len > 0, length(regexp_replace(col("text"), pattern, "")).cast("double") / len)
        .otherwise(0.0)
    docs
      .withColumn("len", len.cast("long"))
      .withColumn("punct_ratio", round(lit(1.0) - classRatio("[.,;:!?]"), 4))
      .withColumn("upper_ratio", round(lit(1.0) - classRatio("[A-Z]"), 4))
      .withColumn("digit_ratio", round(lit(1.0) - classRatio("[0-9]"), 4))
      .withColumn("stopword_count", size(regexp_extract_all(lower(col("text")), lit("\\b(the|a|of|to|and|is|in)\\b"), lit(0))))
      .withColumn(
        "quality_ok",
        col("len") >= 20 && col("punct_ratio") <= 0.3 && col("digit_ratio") <= 0.3
      )
  }

  /** language-ID by stopword-profile counts (n-gram heuristic lite):
    * argmax over per-language marker-word hits, 'und' when all zero.
    */
  def withLangId(docs: DataFrame): DataFrame = {
    val profiles = Seq(
      "en" -> "\\b(the|and|of|to|is|in|that|it)\\b",
      "de" -> "\\b(der|die|das|und|ist|nicht|ein|zu)\\b",
      "fr" -> "\\b(le|la|les|et|est|dans|pour|que)\\b",
      "es" -> "\\b(el|los|las|es|en|por|para|una)\\b"
    )
    val withCounts = profiles.foldLeft(docs) { case (df, (lang, pat)) =>
      df.withColumn(s"_c_$lang", size(regexp_extract_all(lower(col("text")), lit(pat), lit(0))))
    }
    val best = profiles.map { case (lang, _) => struct(col(s"_c_$lang").as("c"), lit(lang).as("l")) }
    withCounts
      .withColumn("_best", greatest(best: _*))
      .withColumn("lang_id", when(col("_best.c") > 0, col("_best.l")).otherwise("und"))
      .drop(profiles.map(p => s"_c_${p._1}"): _*)
      .drop("_best")
  }

  /** deterministic 64-bit document fingerprint: polynomial rolling hash over
    * tokens (token → crc32, combined with multiplier 1000003). Pure
    * `aggregate` expression — codegen-friendly, no UDF.
    */
  def withFingerprint(docs: DataFrame): DataFrame =
    docs.withColumn(
      "fingerprint",
      aggregate(
        tokens(col("text")),
        lit(0L),
        // modular polynomial hash — keeps the accumulator < 1e9+7 so the
        // multiply never overflows under ANSI arithmetic
        (acc, t) => pmod(acc * lit(1000003L) + crc32(t), lit(1000000007L))
      )
    )

  /** exact dedup: group identical texts (by md5), keep the smallest doc_id.
    * Null-text docs are EXCLUDED: md5(null) is null, so grouping would mark
    * every failed-extraction doc as a "duplicate" of all the others and a
    * caller acting on keep_id would drop distinct documents.
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .where(col("text").isNotNull)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("cnt"))

  /** word n-gram shingles of a document, distinct, exploded to long rows.
    * Native WordShingles expression (round 8): the former
    * transform/slice/concat_ws/array_distinct chain paid the lambda
    * interpreter per token per document (HOFs never codegen) — measured as
    * the dominant map-side cost of the Jaccard/MinHash queries; identical
    * shingle strings, one JIT'd eval per row (TextExpressionsSpec).
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .select(col("doc_id"), explode(graft.functions.TextExpressions.wordShingles(col("text"), n)).as("shingle"))

  /** shingles + the per-doc distinct-shingle count carried THROUGH the
    * explode: n_sh is size(distinct array), computed on the pre-explode row,
    * so Jaccard's union sizes need no second shingling pass and no join-back
    * (the former per-doc counts table re-ran the full tokenize+shingle
    * subtree once per join side). 8 extra bytes per shingle row through the
    * exchange buys the removal of two broadcast joins and two corpus sweeps.
    */
  private[text] def shinglesWithCount(docs: DataFrame, n: Int): DataFrame =
    docs
      .select(col("doc_id"), graft.functions.TextExpressions.wordShingles(col("text"), n).as("_shs"))
      // explode_outer + isNotNull ≡ explode here (shingleArray never holds
      // null elements, so only the empty/null-array row is dropped either
      // way), but with a crucial plan difference: plain explode over the
      // ATTRIBUTE _shs lets InferFiltersFromGenerate add a
      // size(_shs)>0 filter that projection collapse inlines into TWO full
      // copies of the shingle expression and pushes below the upstream
      // exchange — the whole tokenize+shingle pipeline then runs twice,
      // serially, in the scan stage (measured 5× slower at sf0.1). The rule
      // skips outer generates.
      .select(col("doc_id"), size(col("_shs")).as("n_sh"), explode_outer(col("_shs")).as("shingle"))
      .where(col("shingle").isNotNull)

  /** MinHash signatures: k pseudo-permutations h_i(s) = (a_i·crc32(s) + b_i)
    * mod p, per-doc min. Output: doc_id, sig ARRAY<BIGINT>[k].
    */
  def minHashSignatures(shingled: DataFrame, k: Int = 32): DataFrame = {
    val p = 4294967311L // prime > 2^32
    val hashed = shingled.withColumn("_h", crc32(col("shingle")))
    val perms = (0 until k).map { i =>
      val a = 1L + 2L * i // odd multipliers
      val b = 31L * i + 7L
      min(pmod(col("_h") * a + b, lit(p))).as(s"_m$i")
    }
    hashed
      .groupBy("doc_id")
      .agg(perms.head, perms.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"_m$i")): _*).as("sig"))
  }

  /** LSH banding: split the k-wide signature into bands of `rowsPerBand`,
    * bucket on (band, band-hash), emit candidate pairs sharing a bucket.
    * The shuffle key is (band, hash) — uniform by construction.
    */
  def minHashCandidatePairs(
      signatures: DataFrame,
      rowsPerBand: Int = 4,
      maxBucketSize: Int = 256,
      hardCap: Boolean = false
  ): DataFrame = {
    require(rowsPerBand > 0, s"rowsPerBand must be positive, got $rowsPerBand")
    require(maxBucketSize >= 1, s"maxBucketSize must be >= 1, got $maxBucketSize")
    // CEILING band count: truncating division silently ignored the trailing
    // k % rowsPerBand signature components (recall loss with no warning),
    // and k < rowsPerBand made sequence(0, -1) DESCEND, creating a
    // degenerate band shared by every doc. The last band may be narrower —
    // slice past the array end just yields the shorter tail.
    val banded = signatures
      // an EMPTY caller-supplied sig makes the band sequence(0, -1) DESCEND
      // to [0, -1]: two empty-slice bands whose band_sig every empty-sig doc
      // shares — all such docs would become candidate pairs of each other
      // (minHashSignatures never emits empty sigs, but this entry is public)
      .where(size(col("sig")) > 0)
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), ceil(size(col("sig")).cast("double") / rowsPerBand).cast("int") - 1),
            b => slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))
          )
        ).as(Seq("band", "band_sig"))
      )
      // 64-bit bucket key: the 32-bit hash() saturates at billions of docs
      // per band, merging unrelated signature groups into one bucket — the
      // merged bucket trips the cap and its REAL candidate pairs are
      // silently dropped
      .select(col("doc_id"), col("band"), xxhash64(col("band"), col("band_sig")).as("bucket"))
    // hot-bucket cap: a bucket of B docs emits B²/2 pairs — at corpus scale a
    // degenerate bucket (e.g. boilerplate-identical band signatures) is a
    // cross-product bomb. Over-cap buckets are THINNED to ≈cap docs by a
    // deterministic per-(band, bucket)-salted hash, not dropped wholesale:
    // an over-cap bucket IS the strongest dedup signal there is (identical
    // band signatures, e.g. 1000 copies of one boilerplate doc), and every
    // band of such a clone group trips the cap — dropping would return zero
    // candidates for exactly the most-duplicated documents. Under the
    // DEFAULT hash-modulus mode, sampled-bucket output stays ≈|buckets|·cap²
    // in expectation (binomial survivor count, mean cap — Thinning's
    // scaladoc); `hardCap = true` switches to the rank-based variant whose
    // bound is EXACT (max bucket ≤ cap), for callers that need the strict
    // |buckets|·cap² sizing. Unlike the ANN census (a bounded bucket-id
    // space that would funnel a window), the key here is the 64-bit
    // band-signature hash — high-cardinality by construction — so BOTH
    // modes run as a window over the SAME (band, bucket) exchange the
    // self-join needs: the cap costs no extra sweep of the corpus (the
    // hard-cap variant adds only the per-bucket sort of row_number vs the
    // unordered count).
    val capped =
      if (hardCap)
        graft.spark.Thinning.hardCapSurvivors(
          banded, maxBucketSize, Seq(col("band"), col("bucket")), Seq(col("doc_id"), col("band"), col("bucket"))
        )
      else {
        val wB = Window.partitionBy("band", "bucket")
        banded
          .withColumn("_bsz", count(lit(1)).over(wB))
          .where(graft.spark.Thinning.survivesCap(col("_bsz"), maxBucketSize, col("doc_id"), col("band"), col("bucket")))
          .drop("_bsz")
      }
    val a = capped.as("a")
    val b = capped.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** exact n-gram Jaccard similarity for candidate (or all intersecting)
    * pairs via an inverted shingle index: explode → self-join on shingle →
    * |∩| per pair; |∪| from per-doc shingle counts.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.8, maxShingleDf: Int = 1000): DataFrame = {
    // n_sh (the Jaccard denominator's per-doc term) rides along on every
    // shingle row — see shinglesWithCount: the former per-doc counts table
    // cost two more full tokenize+shingle sweeps and two join-backs
    val sh = shinglesWithCount(docs, n)
    // document-frequency cap (standard): a shingle in D docs contributes D²
    // join rows — one ubiquitous trigram at corpus scale is quadratic. Drop
    // shingles with df > maxShingleDf BEFORE the inverted-index self-join;
    // union sizes (the Jaccard denominator) stay uncapped, so a missed hot
    // shingle can only lower a pair's measured intersection. The window and
    // the self-join share the shingle partitioning (one exchange, reused).
    val wSh = Window.partitionBy("shingle")
    val kept = sh
      .withColumn("_df", count(lit(1)).over(wSh))
      .where(col("_df") <= maxShingleDf)
      .drop("_df")
    // per-pair |∩| with the two |doc| terms folded into the SAME aggregate
    // (first() is well-defined: n_sh is constant within a (doc_a, doc_b)
    // group) — no counts join at all
    kept
      .as("a")
      .join(kept.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"), first(col("a.n_sh")).as("n_a"), first(col("b.n_sh")).as("n_b"))
      .withColumn("jaccard", col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Dedup completion: connected components over near-duplicate PAIRS (from
    * ngramJaccardPairs / minHashCandidatePairs / Ann.nearDupPairs) —
    * min-label propagation WITH pointer jumping (path halving): every round
    * propagates labels across edges, then shortcuts label := label(label).
    * Plain propagation needs O(diameter) shuffle rounds — a 100-doc
    * transitive near-dup chain (common in crawl data) would exhaust maxIter
    * and silently return WRONG groups; with the jump the label distance
    * halves each round, so maxIter = 20 covers ~10^6-diameter components.
    * Non-convergence now throws instead of returning partial labels.
    * Each doc's label converges to the smallest doc_id in its component;
    * `keep` marks the canonical survivor. Each round = two payload-light
    * (id, label) shuffle joins + an aggregate, lineage cut by
    * localCheckpoint (GraphX-free CC at scale).
    */
  def dedupGroups(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.checkpointedRdd
    // release a superseded localCheckpoint generation: each one pins
    // MEMORY_AND_DISK blocks until the session ends, so an iterative loop
    // would otherwise retain every round's labels simultaneously
    def release(df: DataFrame): Unit = checkpointedRdd(df).foreach(_.unpersist(blocking = false))
    // symmetrize via explode, NOT a self-union: the union's two branches
    // each re-execute the (potentially expensive) candidate-pair plan, which
    // previously forced a separate checkpoint of the raw pairs first; the
    // explode emits both directed edges from ONE pass over the pairs plan,
    // so the only materialization is the edges checkpoint itself.
    // Dedupe via repartition(src) + dropDuplicates instead of distinct():
    // hashpartitioning(src) satisfies the (src, dst) clustering the dedup
    // aggregate needs (same-src rows share a partition), so this is ONE
    // exchange instead of two — and the checkpoint PRESERVES the src
    // partitioning, so every round's edges-side propagation join below runs
    // exchange-free on the edges side for the whole loop
    val edges = pairs
      .select(
        explode(
          array(
            struct(col("doc_a").as("src"), col("doc_b").as("dst")),
            struct(col("doc_b").as("src"), col("doc_a").as("dst"))
          )
        ).as("_e")
      )
      .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
      .repartition(col("src"))
      .dropDuplicates("src", "dst")
      .localCheckpoint()
    // FUSED round 1: the initial labels are the identity map, so the first
    // propagation collapses to ONE aggregate over edges — least(id,
    // min(neighbor)) — replacing the former init (distinct + checkpoint)
    // AND round 1's two joins. Its convergence count is skipped outright:
    // whenever any edge exists, the max-id node of its component has a
    // smaller neighbor, so round 1 always changes a label (and on an empty
    // edge set the loop below confirms convergence on the empty frame in
    // one cheap round). The jump runs in the same job — the aggregate's
    // exchange is identical on both sides of the self-join, so ReuseExchange
    // computes it once.
    // pointer jump as a PLAN transform: label := min(label, label(label)),
    // preserving any extra columns (e.g. the _chg flag) — chains collapse
    // exponentially (path halving).
    def jump(df: DataFrame): DataFrame = {
      val extra = df.columns.filter(c => c != "id" && c != "label").map(col)
      df.join(df.select(col("id").as("label"), col("label").as("_ll")), Seq("label"), "left_outer")
        .select(col("id") +: least(col("label"), coalesce(col("_ll"), col("label"))).as("label") +: extra: _*)
    }
    var labels = {
      val l1 = edges
        .groupBy(col("dst").as("id"))
        .agg(min("src").as("_m"))
        .select(col("id"), least(col("id"), col("_m")).as("label"))
      jump(l1).localCheckpoint()
    }
    // an EMPTY edge set is already converged (labels is empty): without
    // this one cheap head(1) probe on the cached frame, maxIter = 1 would
    // throw "did not converge" on trivially-converged empty input (the
    // fused round 1 skips its convergence count, so the loop below is the
    // first check and it never runs when maxIter = 1)
    var converged = labels.isEmpty
    var i = 1 // round 1 ran fused above
    while (!converged && i < maxIter) {
      // a SECOND jump per round at bounded plan cost: labels is a
      // checkpointed leaf, so jumping it first is a cheap leaf-only
      // self-join (unlike jumping the propagated frame twice, whose
      // subtree duplication measured slower than the rounds it saved).
      // Two jumps per round ⇒ label distance quartered ⇒ ~log₄(diameter)
      // rounds. Monotone-safe: the jump only moves labels toward the
      // component minimum, never below it.
      val base = jump(labels)
      val prop = edges
        .join(base.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min("label").as("_nl"))
      // propagation + pointer jump + the change flag, all inside ONE
      // checkpointed plan per round (formerly: persist propagated → count
      // changed → jump → checkpoint = two full action chains per round; the
      // loop's bench-scale cost was almost entirely that job count).
      // Applying the jump unconditionally is sound: at the propagation
      // fixpoint labels are component-constant and label(label) is the
      // identity, so the converged round's labels are unchanged.
      // _chg records whether PROPAGATION (not the jump) changed the label —
      // the same early-exit frontier the former separate count used.
      // The persist() guarantees the propagation
      // join runs ONCE per round even though the jump references it twice
      // (per-partition cache locking blocks racing readers on the single
      // computation) — unpersisted right after the checkpoint materializes.
      val propagated = base
        .join(prop, Seq("id"), "left_outer")
        .select(
          col("id"),
          least(col("label"), coalesce(col("_nl"), col("label"))).as("label"),
          (least(col("label"), coalesce(col("_nl"), col("label"))) =!= col("label")).as("_chg")
        )
        .persist()
      val next = jump(propagated).localCheckpoint()
      propagated.unpersist(blocking = false)
      // convergence = zero labels changed by propagation this round. The
      // count runs over the checkpoint blocks — one cheap scan-only job.
      // Counting changed rows is overflow-proof — a Σlabel comparison can
      // wrap Long at 100 TB id spaces.
      converged = next.where(col("_chg")).count() == 0
      release(labels)
      labels = next.select("id", "label")
      i += 1
    }
    if (sys.env.contains("GRAFT_CC_DEBUG")) println(s"[cc] converged=$converged rounds=$i")
    release(edges) // the output below reads only the final labels checkpoint
    if (!converged)
      throw new IllegalStateException(
        s"dedupGroups did not converge in $maxIter rounds — component diameter exceeds ~2^$maxIter?"
      )
    labels
      .withColumnRenamed("label", "group_id")
      .withColumn("keep", col("id") === col("group_id"))
  }

  /** SimHash (64-bit): per-token hash bit votes; bit b set iff Σ±1 > 0.
    * One hash aggregate with 64 vote columns — the round-1 formulation
    * exploded every token into 64 bit-rows (64× shuffle volume); votes as
    * parallel aggregate columns keep the shuffle at docs × 64 longs with
    * map-side partial aggregation doing the token work in place.
    *
    * Output has EXACTLY one row per input doc: a token-less (empty/
    * whitespace/null-text) doc gets simhash 0, via explode_outer — a plain
    * explode would silently drop the row, and a consumer joining simhashes
    * back to documents would lose those doc_ids with no warning. The
    * placeholder token's hash is explicitly NULLed (xxhash64 of a null
    * input returns the SEED, which would masquerade as a real token); a
    * NULL hash votes -1 on every bit, so all bits resolve to 0 — no join
    * needed to restore the rows.
    */
  def simHash(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode_outer(tokens(col("text"))).as("_tok"))
      .select(col("doc_id"), when(col("_tok").isNotNull, xxhash64(col("_tok"))).as("_h"))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("_h"), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"_v$b")
    }
    tok
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(
        col("doc_id"),
        (0 until 64)
          .map(b => when(col(s"_v$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
          .reduce(_ + _)
          .as("simhash")
      )
  }
}
