package graft.spark

import graft.ann.Ann
import graft.jobs.FixtureGen
import graft.pipeline.{ColumnAnalyzers, Derive, SeriesOps}
import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan regression tests for the properties the 100 TB path depends
  * on: per-series chains reuse ONE scope exchange, tiny fit/fence tables are
  * broadcast (never shuffled against the big side), similarity self-joins
  * reuse a single scan+exchange, the detect pass has exactly one exchange,
  * and the parquet scan prunes columns. `.explain` is the design contract;
  * these specs keep it from silently regressing.
  */
class PlanShapeSpec extends SparkTestBase {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    needle.r.findAllMatchIn(hay).length

  private lazy val points = {
    val s = spark
    import s.implicits._
    (0 until 2000)
      .map(i => (s"c${i % 7}", "m", (i / 7) * 60L, (i % 13).toDouble))
      .toDF("scope", "metric", "bucket", "value")
  }

  private lazy val docs = {
    val s = spark
    import s.implicits._
    (0 until 80).map(i => (i.toLong, s"alpha beta gamma delta tok$i tail${i % 5}")).toDF("doc_id", "text")
  }

  test("series chain (bucketSum→gapFill→split+stats) introduces no join and ≤2 exchanges") {
    val chained = SeriesOps.withSplitAndStats(
      SeriesOps.gapFill(SeriesOps.bucketSum(points, 60), 60),
      10
    )
    val p = plan(chained)
    assert(count(p, "(?i)exchange") <= 2, s"exchanges:\n$p")
    assert(!p.toLowerCase.contains("join"), "series chain must not contain a join")
  }

  test("sanitize chain adds NO exchange (reuses the scope/metric partitioning)") {
    // withSanitizedTrain's windows partition by the same (scope, metric) key
    // as withSplitAndStats — the whole chain must keep the series-chain
    // exchange budget (≤2) and stay join-free
    val chained = SeriesOps.withSanitizedTrain(
      SeriesOps.withSplitAndStats(SeriesOps.gapFill(SeriesOps.bucketSum(points, 60), 60), 10)
    )
    val p = plan(chained)
    assert(count(p, "(?i)exchange") <= 2, s"exchanges:\n$p")
    assert(!p.toLowerCase.contains("join"), "sanitize must not introduce a join")
  }

  test("fit/fence joins are broadcast (ols, iqr, random-walk, time-bucket)") {
    val stats = SeriesOps.withSplitAndStats(points, 10)
    for (
      (name, df) <- Seq(
        "ols" -> ColumnAnalyzers.olsForecastFlags(stats),
        "iqr" -> ColumnAnalyzers.iqrFlags(stats),
        "rw" -> ColumnAnalyzers.randomWalkFlags(stats),
        "tb" -> ColumnAnalyzers.timeBucketFlags(stats)
      )
    ) {
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$name must not sort-merge a tiny fit table:\n$p")
    }
  }

  test("ngram jaccard self-join reuses one shingle scan+exchange") {
    // force the shuffle join (tiny test data would broadcast) and read the
    // FINAL adaptive plan — ReusedExchange materializes after execution
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // non-binding cap: with a binding one this tiny corpus yields zero
      // pairs and AQE collapses the whole plan to EmptyRelation
      val df = TextOps.ngramJaccardPairs(docs, 3, 0.1, maxShingleDf = 500)
      df.collect() // finalize THIS df's adaptive plan (count() builds a new tree)
      val p = plan(df)
      // both join inputs are the SAME capped-shingle subplan → ReusedExchange
      assert(p.contains("ReusedExchange"), s"expected exchange reuse:\n$p")
      assert(!p.contains("CartesianProduct"), "no cross product")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ngram jaccard folds doc sizes into the pair aggregate — no per-doc counts subtree") {
    // round 8: n_sh rides each shingle row (shinglesWithCount), so the plan
    // holds exactly the two self-join sides' shingle subtrees — the old
    // shape built a per-doc counts table from TWO MORE full
    // tokenize+shingle sweeps and broadcast-joined it back twice
    val p = plan(TextOps.ngramJaccardPairs(docs, 3, 0.1, maxShingleDf = 500))
    assert(count(p, "Generate") <= 2, s"more than the two self-join shingle subtrees:\n$p")
  }

  test("LSH self-join is equi-keyed on (table, bucket) — no cross product") {
    val s = spark
    import s.implicits._
    val emb = (0 until 64)
      .map(i => (i.toLong, (0 until 8).map(d => ((i + d) % 5).toDouble).toArray))
      .toDF("vec_id", "embedding")
    val p = plan(Ann.nearDupPairs(emb, 0.5, nPlanes = 4, nTables = 2))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), s"\n$p")
    // the dedup aggregation must run on (id, id, sim) rows — no embedding
    // arrays in the aggregate output schema
    val aggLine = p.linesIterator.filter(l => l.contains("HashAggregate") && l.contains("id_a")).toSeq
    assert(aggLine.nonEmpty && !aggLine.exists(_.contains("embedding")), s"dedup shuffles embeddings:\n$p")
  }

  test("nearDupPairs self-join reuses ONE bucketing sweep (census is the only extra)") {
    // the bucketing subtree (scan + nTables·nPlanes plane dot products per
    // row) is the expensive part; the explicit repartition(t, b) makes both
    // self-join sides the SAME exchange so one side is a ReusedExchange
    // leaf. Without it each side AND the census re-ran the sweep — 4 full
    // corpus sweeps, measured 7× slower at sf0.1. Final plan must show at
    // most 2 materialized bucketing subtrees (census + shared side).
    val s = spark
    import s.implicits._
    val emb = (0 until 64)
      .map(i => (i.toLong, (0 until 8).map(d => ((i + d) % 5).toDouble).toArray))
      .toDF("vec_id", "embedding")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Ann.nearDupPairs(emb, 0.5, nPlanes = 4, nTables = 2, dims = 8)
      df.collect() // finalize THIS df's adaptive plan
      // count in the FINAL-plan section only: AdaptiveSparkPlan's toString
      // appends the reuse-free "== Initial Plan ==", which would triple the
      // subtree counts regardless of what actually executed
      val p = plan(df).split("== Initial Plan ==")(0)
      assert(p.contains("ReusedExchange"), s"self-join sides must share one exchange:\n$p")
      assert(count(p, "Generate explode") <= 2, s"bucketing sweep materialized more than census+side:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("detect has exactly one exchange (repartition by scope)") {
    val ds = Detect.toPoints(points)(spark)
    val validated = Detect.detectValidated(ds, graft.model.EngineConfig(resolution = 60))
    val p = plan(validated.toDF())
    assert(count(p, "(?i)exchange") - count(p, "ReusedExchange") == 1, s"\n$p")
  }

  test("derive pushes column pruning into the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan").toString
    FixtureGen.synthetic(spark, nConvs = 4, maxTurns = 50, partitions = 1).write.parquet(s"$dir/t")
    val derived = Derive.deriveSeries(spark.read.parquet(s"$dir/t"), 60L)
    val scan = derived.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("FileScan"))
      .getOrElse("")
    assert(scan.contains("ReadSchema"), scan)
    // the table carries 6 columns; derive (without extraMetrics) needs only
    // conv_id, role, text, ts — turn_idx and tool must be pruned at the scan
    assert(!scan.contains("tool") && !scan.contains("turn_idx"), s"unpruned columns: $scan")
  }
}
