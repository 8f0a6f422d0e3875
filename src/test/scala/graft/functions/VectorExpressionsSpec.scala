package graft.functions

import graft.spark.SparkTestBase
import org.apache.spark.sql.functions._

/** Native DotProduct/SquaredNorm expressions: bit-equality with the
  * composable zip_with/aggregate formulation, null behavior, and codegen
  * (the plan's project must sit inside WholeStageCodegen).
  */
class VectorExpressionsSpec extends SparkTestBase {

  test("dot/squaredNorm match the higher-order-function formulation bit-for-bit") {
    val s = spark
    import s.implicits._
    val df = (0 until 200)
      .map(i => ((0 until 16).map(d => math.sin(i * 17 + d)).toArray, (0 until 16).map(d => math.cos(i * 31 + d)).toArray))
      .toDF("a", "b")
    val hofDot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val hofNorm = aggregate(col("a"), lit(0.0), (acc, v) => acc + v * v)
    val rows = df
      .select(
        VectorExpressions.dot(col("a"), col("b")).as("d1"),
        hofDot.as("d2"),
        VectorExpressions.squaredNorm(col("a")).as("n1"),
        hofNorm.as("n2")
      )
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot bit-equality")
      assert(r.getDouble(2) == r.getDouble(3), "norm bit-equality")
    }
  }

  test("SQL functions registered via SparkSessionExtensions") {
    // inject into the existing test session's registry (same code path the
    // extension runs at session build time)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // building a full second SparkSession is heavy; register directly
    val s = spark
    import s.implicits._
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      GraftExtensions.buildDotProduct _ // the PRODUCTION builder, not a test copy
    )
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b").createOrReplaceTempView("v_dot")
    val r = spark.sql("SELECT dot_product(a, b) AS d FROM v_dot").head.getDouble(0)
    assert(r == 32.0)
  }

  test("chunk_explode: native generator decodes chunks, rejects non-binary, skips nulls") {
    val s = spark
    import s.implicits._
    val ts = Array(1000L, 1060L, 1120L)
    val vs = Array(1.5, 2.5, -3.25)
    val chunk = graft.codec.ChunkCodec.encode(ts, vs)
    val df = Seq(("a", chunk), ("b", null.asInstanceOf[Array[Byte]])).toDF("scope", "data")
    val out = df.select(col("scope"), ChunkExplode.chunkExplode(col("data")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("a", 1000L, 1.5), ("a", 1060L, 2.5), ("a", 1120L, -3.25)),
      out.toSeq.toString) // null chunk → zero rows, like explode(null)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(ChunkExplode.chunkExplode(col("scope"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary"), e.getMessage)
  }

  test("chunk_explode SQL surface: LATERAL VIEW over a chunked table matches the DataFrame path") {
    val s = spark
    import s.implicits._
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // exercise the injection path
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("chunk_explode"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(classOf[ChunkExplode].getName, "chunk_explode"),
      GraftExtensions.buildChunkExplode _ // the PRODUCTION builder, not a test copy
    )
    val points = Seq(
      ("a", "m", 1000L, 1.5),
      ("a", "m", 1060L, 2.5),
      ("b", "m", 500L, -3.25),
      ("b", "m", 100000L, 7.0)
    ).toDF("scope", "metric", "bucket", "value")
    graft.codec.ChunkTables.pack(points).createOrReplaceTempView("chunks")
    val sqlOut = spark.sql(
      "SELECT scope, metric, c.bucket, c.value FROM chunks LATERAL VIEW chunk_explode(data) c AS bucket, value"
    )
    val dfOut = graft.codec.ChunkTables.unpack(spark.table("chunks"))
    assert(sqlOut.count() == 4)
    assert(sqlOut.exceptAll(dfOut).isEmpty && dfOut.exceptAll(sqlOut).isEmpty,
      "SQL LATERAL VIEW decode must equal the DataFrame chunkExplode decode")
  }

  test("cosine_similarity SQL function composes the native expressions") {
    val s = spark
    import s.implicits._
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // exercise the injection path
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(classOf[DotProduct].getName, "cosine_similarity"),
      GraftExtensions.buildCosine _ // the PRODUCTION builder, not a test copy
    )
    Seq((Array(1.0, 0.0), Array(1.0, 0.0)), (Array(1.0, 0.0), Array(0.0, 1.0)))
      .toDF("a", "b").createOrReplaceTempView("v_cos")
    val got = spark.sql("SELECT cosine_similarity(a, b) AS c FROM v_cos").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 0.0), got.toString)
  }

  test("non-double arrays are an ANALYSIS error, not silent garbage") {
    val s = spark
    import s.implicits._
    // ArrayData.getDouble on an int buffer returns junk silently — the SQL
    // surface must reject at analysis time via checkInputDataTypes
    val df = Seq((Array(1, 2, 3), Array(4.0, 5.0, 6.0))).toDF("ai", "ad")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.dot(col("ai"), col("ai"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<double>"), e.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.squaredNorm(col("ai"))).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("array<double>"), e2.getMessage)
    // valid double arrays still fine
    assert(df.select(VectorExpressions.squaredNorm(col("ad"))).head.getDouble(0) == 77.0)
  }

  /** asserts the EXECUTED query's plan carries (or lacks) a WholeStageCodegen
    * span on the line computing dot_product — the '*(n)' prefix in the plan
    * string. Shared by the codegen-shape tests so the idiom can't drift.
    */
  private def assertCodegenSpan(out: org.apache.spark.sql.DataFrame, expected: Boolean, ctx: String): Unit = {
    val p = out.queryExecution.executedPlan.toString
    val projLine = p.linesIterator.find(_.contains("dot_product")).getOrElse("")
    val inSpan = """\*\(\d+\) Project""".r.findFirstIn(projLine).isDefined
    if (expected) assert(inSpan, s"$ctx: dot_product not codegen'd:\n$p")
    else assert(!inSpan, s"$ctx: must NOT be whole-stage codegen'd: $projLine")
  }

  test("null-safe and codegen'd") {
    val s = spark
    import s.implicits._
    // materialize the arrays via parquet: an interpreted HOF (transform) in
    // the same projection would knock the whole operator out of codegen —
    // the very overhead the native expression exists to avoid
    val dir = java.nio.file.Files.createTempDirectory("graft_vec").toString
    spark
      .range(4)
      .select(
        col("id"),
        when(col("id") =!= 1, transform(sequence(lit(0), lit(3)), d => d.cast("double") + col("id"))).as("a"),
        transform(sequence(lit(0), lit(3)), d => d.cast("double") * 2).as("b")
      )
      .write.parquet(s"$dir/v")
    val df = spark.read.parquet(s"$dir/v")
    val out = df.select(col("id"), VectorExpressions.dot(col("a"), col("b")).as("d")).orderBy("id")
    val got = out.collect().map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq
    // id=k: a=[k,k+1,k+2,k+3], b=[0,2,4,6] → dot = 2(k+1)+4(k+2)+6(k+3) = 12k+28
    assert(got == Seq(28.0, null, 52.0, 64.0), got.toString)
    assertCodegenSpan(out, expected = true, "null-safe")
  }

  test("null elements and length mismatches yield NULL, matching the zip_with form") {
    val s = spark
    import s.implicits._
    // getDouble on a null slot silently reads 0.0 — before the fix,
    // dot([1, NULL], [2, 3]) returned a PLAUSIBLE 2.0 while the documented-
    // equivalent zip_with/aggregate form returns NULL; mismatched lengths
    // (a 2-d query against a 3-d corpus) truncated instead of erroring.
    // MATERIALIZE via parquet: a Seq.toDF LocalRelation is folded by
    // ConvertToLocalRelation through an InterpretedMutableProjection on the
    // driver, so the doGenCode branches would never run (and
    // codegen.factoryMode doesn't gate WholeStageCodegen at all)
    val dir = java.nio.file.Files.createTempDirectory("graft_vec_null").toString
    Seq(
      (1L, Array[java.lang.Double](1.0, null), Array[java.lang.Double](2.0, 3.0)),
      (2L, Array[java.lang.Double](1.0, 2.0, 3.0), Array[java.lang.Double](1.0, 2.0)),
      (3L, Array[java.lang.Double](1.0, 2.0), Array[java.lang.Double](3.0, 4.0))
    ).toDF("id", "a", "b").write.parquet(s"$dir/v")
    val df = spark.read.parquet(s"$dir/v")
    def check(leg: String): Unit = {
      // orderBy is part of the SAME query whose plan is asserted — checking
      // a different DataFrame's plan than the one executed proves nothing
      val out = df.select(
        col("id"),
        VectorExpressions.dot(col("a"), col("b")).as("d"),
        VectorExpressions.squaredNorm(col("a")).as("n")
      ).orderBy("id")
      val rows = out.collect()
      assert(rows(0).isNullAt(1) && rows(0).isNullAt(2), s"$leg: null element must poison dot and norm")
      assert(rows(1).isNullAt(1), s"$leg: length mismatch must yield NULL, not a truncated dot")
      assert(rows(1).getDouble(2) == 14.0, s"$leg: norm of the well-formed side still computes")
      assert(rows(2).getDouble(1) == 11.0 && rows(2).getDouble(2) == 5.0, s"$leg: clean rows unaffected")
      assertCodegenSpan(out, expected = leg == "codegen", leg)
    }
    // codegen leg: fallback DISABLED — with the default
    // spark.sql.codegen.fallback=true a broken generated body would be
    // silently executed interpreted and this test would stay green
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try check("codegen")
    finally {
      spark.conf.unset("spark.sql.codegen.fallback")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    // interpreted leg: disable whole-stage AND force the interpreted
    // projection factory so nullSafeEval is what actually executes
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check("interpreted")
    finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("SQL cosine_similarity guards zero norms and raises WRONG_NUM_ARGS for bad arity") {
    val s = spark
    import s.implicits._
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity_t"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(GraftExtensions.getClass.getName, "cosine_similarity_t"),
      GraftExtensions.buildCosine _
    )
    Seq(
      (Array(0.0, 0.0), Array(1.0, 2.0)),
      // NaN ELEMENT: the old hand-built If-guard leaked NaN here (NaN denom
      // passes `denom > 0` under Spark's NaN-high ordering) — NaN then wins
      // every ORDER BY sim DESC, the exact failure the guard exists for
      (Array(Double.NaN, 1.0), Array(1.0, 2.0)),
      (Array(3.0, 4.0), Array(3.0, 4.0))
    ).toDF("a", "b").createOrReplaceTempView("v_cos")
    val sims = spark.sql("SELECT cosine_similarity_t(a, b) AS sim FROM v_cos ORDER BY sim").collect().map(_.getDouble(0))
    // zero-norm AND NaN-element = -1 (never NaN, which sorts ABOVE 1.0)
    assert(sims.toSeq.take(2) == Seq(-1.0, -1.0) && math.abs(sims(2) - 1.0) < 1e-12, sims.mkString(","))
    // wrong arity is a USER error → AnalysisException, like every built-in
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT cosine_similarity_t(a) FROM v_cos").collect()
    )
    assert(e.getMessage.contains("parameters"), e.getMessage)
  }
}
