package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook (the brief's extension point for custom
  * operators): registers the native vector expressions as SQL functions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works in any session built
  * with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftExtensions {
  // builders shared by the injection below AND the specs (a test registering
  // its own copy would not catch a bug in the injected one)

  /** a wrong SQL argument count is a USER error: raise the same
    * AnalysisException (WRONG_NUM_ARGS) every built-in produces, not a raw
    * IllegalArgumentException with an analyzer-internal stack trace
    */
  private def requireArity(name: String, expected: Int, children: Seq[Expression]): Unit =
    if (children.length != expected)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"
        ),
        None
      )

  private[graft] def buildDotProduct(children: Seq[Expression]): Expression = {
    requireArity("dot_product", 2, children)
    DotProduct(children.head, children(1))
  }
  private[graft] def buildSquaredNorm(children: Seq[Expression]): Expression = {
    requireArity("squared_norm", 1, children)
    SquaredNorm(children.head)
  }
  private[graft] def buildCosine(children: Seq[Expression]): Expression = {
    requireArity("cosine_similarity", 2, children)
    // literally the SAME Catalyst tree as the DataFrame surface (Ann.cosine
    // → VectorExpressions.cosine → cosineExpr) — a hand-built copy here
    // once diverged on NaN elements (denom = NaN passes a `denom > 0` check
    // under Spark's NaN-high ordering, so NaN leaked out and won every SQL
    // top-k) and paid each squared_norm twice
    VectorExpressions.cosineExpr(children.head, children(1))
  }
  private[graft] def buildChunkExplode(children: Seq[Expression]): Expression = {
    requireArity("chunk_explode", 1, children)
    ChunkExplode(children.head)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        GraftExtensions.buildDotProduct _
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("squared_norm"),
        new ExpressionInfo(classOf[SquaredNorm].getName, "squared_norm"),
        GraftExtensions.buildSquaredNorm _
      )
    )
    // cosine_similarity(a, b) — composed from the native expressions, same
    // semantics (and zero-norm guard) as graft.ann.Ann.cosine. The info
    // class names the composing builder, not some other function's class.
    ext.injectFunction(
      (
        new FunctionIdentifier("cosine_similarity"),
        new ExpressionInfo(GraftExtensions.getClass.getName, "cosine_similarity"),
        GraftExtensions.buildCosine _
      )
    )
    // chunk_explode(data) — the native Gorilla/DoD chunk-decode Generator.
    // Being a Generator it works in LATERAL VIEW and the SELECT list exactly
    // like built-in explode; without this registration, SQL sessions could
    // not read chunked history tables at all (the decode was
    // DataFrame-API-only).
    ext.injectFunction(
      (
        new FunctionIdentifier("chunk_explode"),
        new ExpressionInfo(classOf[ChunkExplode].getName, "chunk_explode"),
        GraftExtensions.buildChunkExplode _
      )
    )
  }
}
